"""Optimizer-zoo tests: sgd / lion / adafactor update rules against
hand-computed oracles, state layouts, and the sharded train path.

The reference has no training loop at all; the optimizer family is part of
this rebuild's production-training surface (models/train.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.train import (
    OptConfig,
    apply_update,
    init_opt_state,
    make_train_step,
)
from kfunca_tpu.models.transformer import TransformerConfig, init_params


def tiny_cfg():
    return TransformerConfig(
        vocab_size=64, d_model=64, n_heads=2, n_layers=2, d_ff=128, dtype="float32"
    )


def _toy_params():
    return {
        "w": jnp.asarray([[1.0, -2.0], [0.5, 3.0]], jnp.float32),
        "b": jnp.asarray([0.1, -0.1], jnp.float32),
    }


def _toy_grads():
    return {
        "w": jnp.asarray([[0.3, -0.7], [0.2, 0.4]], jnp.float32),
        "b": jnp.asarray([0.05, -0.02], jnp.float32),
    }


class TestStateLayouts:
    def test_adamw_default_layout_unchanged(self):
        p = _toy_params()
        s = init_opt_state(p)  # no oc: historical adamw layout
        assert set(s) == {"step", "m", "v"}
        assert s["m"]["w"].shape == p["w"].shape

    def test_sgd_lion_single_moment(self):
        p = _toy_params()
        for algo in ("sgd", "lion"):
            s = init_opt_state(p, OptConfig(algo=algo))
            assert set(s) == {"step", "m"}

    def test_adafactor_factored_shapes(self):
        p = _toy_params()
        s = init_opt_state(p, OptConfig(algo="adafactor"))
        assert set(s) == {"step", "vr", "vc", "v1"}
        # 2-D leaf (r, c): vr is (r,) row means, vc is (c,) col means,
        # v1 a () dummy; 1-D leaf keeps full v1 and () factored dummies
        assert s["vr"]["w"].shape == (2,) and s["vc"]["w"].shape == (2,)
        assert s["v1"]["w"].shape == ()
        assert s["v1"]["b"].shape == (2,)
        assert s["vr"]["b"].shape == () and s["vc"]["b"].shape == ()

    def test_unknown_algo_raises(self):
        p = _toy_params()
        with pytest.raises(ValueError, match="unknown optimizer"):
            apply_update(p, _toy_grads(), init_opt_state(p), OptConfig(algo="adagrad"))


class TestSGD:
    def test_matches_numpy_momentum(self):
        oc = OptConfig(algo="sgd", lr=0.1, momentum=0.9, weight_decay=0.0)
        p, g = _toy_params(), _toy_grads()
        s = init_opt_state(p, oc)
        np_m = {k: np.zeros_like(np.asarray(v)) for k, v in p.items()}
        np_p = {k: np.asarray(v).copy() for k, v in p.items()}
        for _ in range(3):
            p, s = apply_update(p, g, s, oc)
            for k in np_p:
                np_m[k] = 0.9 * np_m[k] + np.asarray(g[k])
                np_p[k] = np_p[k] - 0.1 * np_m[k]
        for k in np_p:
            assert np.allclose(np.asarray(p[k]), np_p[k], atol=1e-6), k

    def test_nesterov_lookahead(self):
        # single step from zero momentum: u = g + mu*(mu*0 + g) = (1+mu)*g
        oc = OptConfig(algo="sgd", lr=0.1, momentum=0.5, nesterov=True,
                       weight_decay=0.0)
        p, g = _toy_params(), _toy_grads()
        p2, _ = apply_update(p, g, init_opt_state(p, oc), oc)
        expect = np.asarray(p["w"]) - 0.1 * 1.5 * np.asarray(g["w"])
        assert np.allclose(np.asarray(p2["w"]), expect, atol=1e-6)

    def test_decay_mask_skips_1d(self):
        oc = OptConfig(algo="sgd", lr=0.1, momentum=0.0, weight_decay=0.5)
        p = _toy_params()
        zero_g = jax.tree_util.tree_map(jnp.zeros_like, p)
        p2, _ = apply_update(p, zero_g, init_opt_state(p, oc), oc)
        # 2-D decays, 1-D (bias) untouched
        assert np.allclose(np.asarray(p2["w"]), np.asarray(p["w"]) * (1 - 0.05))
        assert np.allclose(np.asarray(p2["b"]), np.asarray(p["b"]))


class TestLion:
    def test_update_magnitude_is_lr(self):
        """Lion's update is sign(...) -> every element moves by exactly lr."""
        oc = OptConfig(algo="lion", lr=0.01, beta1=0.9, beta2=0.99,
                       weight_decay=0.0)
        p, g = _toy_params(), _toy_grads()
        p2, _ = apply_update(p, g, init_opt_state(p, oc), oc)
        delta = np.abs(np.asarray(p2["w"]) - np.asarray(p["w"]))
        assert np.allclose(delta, 0.01, atol=1e-7)

    def test_direction_is_sign_of_interp(self):
        oc = OptConfig(algo="lion", lr=0.01, beta1=0.9, beta2=0.99,
                       weight_decay=0.0)
        p, g = _toy_params(), _toy_grads()
        p2, s = apply_update(p, g, init_opt_state(p, oc), oc)
        # first step: m=0 -> direction = sign((1-b1) g) = sign(g)
        assert np.allclose(
            np.asarray(p2["w"]),
            np.asarray(p["w"]) - 0.01 * np.sign(np.asarray(g["w"])),
            atol=1e-7,
        )
        # moment EMA: m1 = (1-b2) g
        assert np.allclose(
            np.asarray(s["m"]["w"]), 0.01 * np.asarray(g["w"]), atol=1e-7
        )


class TestAdafactor:
    def test_factored_second_moment_first_step(self):
        """Step 1: decay b2 = 1 - 1^-0.8 = 0 -> vr/vc = row/col means of g^2,
        update = g / sqrt(rank-1 reconstruction), RMS-clipped at 1."""
        oc = OptConfig(algo="adafactor", lr=0.1, weight_decay=0.0)
        p, g = _toy_params(), _toy_grads()
        p2, s = apply_update(p, g, init_opt_state(p, oc), oc)
        g2 = np.asarray(g["w"]) ** 2 + 1e-30
        vr, vc = g2.mean(axis=1), g2.mean(axis=0)
        assert np.allclose(np.asarray(s["vr"]["w"]), vr, atol=1e-7)
        assert np.allclose(np.asarray(s["vc"]["w"]), vc, atol=1e-7)
        vhat = np.outer(vr, vc) / vr.mean()
        u = np.asarray(g["w"]) / np.sqrt(vhat)
        u = u / max(1.0, float(np.sqrt((u * u).mean() + 1e-30)))
        assert np.allclose(np.asarray(p2["w"]), np.asarray(p["w"]) - 0.1 * u,
                           atol=1e-5)

    def test_memory_is_factored(self):
        """For a (256, 512) matrix the second-moment state is 256+512
        elements, not 256*512 — the whole point of adafactor."""
        p = {"w": jnp.zeros((256, 512), jnp.float32)}
        s = init_opt_state(p, OptConfig(algo="adafactor"))
        n_state = sum(x.size for x in jax.tree_util.tree_leaves(s))
        assert n_state <= 256 + 512 + 3  # + step and () dummies


class TestTraining:
    @pytest.mark.parametrize("algo,lr", [("sgd", 3e-2), ("lion", 3e-3),
                                         ("adafactor", 5e-3)])
    def test_loss_decreases(self, algo, lr):
        cfg = tiny_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        oc = OptConfig(algo=algo, lr=lr, clip_norm=1.0)
        opt = init_opt_state(params, oc)
        step = jax.jit(make_train_step(cfg, oc))
        tokens = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) * 3) % cfg.vocab_size
        targets = (tokens + 1) % cfg.vocab_size
        losses = []
        for _ in range(6):
            params, opt, loss = step(params, opt, tokens, targets)
            losses.append(float(loss))
        assert losses[-1] < losses[0], f"{algo}: {losses}"

    def test_grad_accum_matches_full_batch(self):
        """grad_accum=4 over batch 8 == one full-batch step: loss_fn means
        over the batch, so the mean of microbatch grads is the batch grad."""
        cfg = tiny_cfg()
        oc = OptConfig(lr=1e-3, clip_norm=None)
        tokens = (jnp.arange(8 * 16, dtype=jnp.int32).reshape(8, 16) * 5) % cfg.vocab_size
        targets = (tokens + 1) % cfg.vocab_size

        outs = {}
        for accum in (1, 4):
            params = init_params(jax.random.PRNGKey(0), cfg)
            opt = init_opt_state(params, oc)
            step = jax.jit(make_train_step(cfg, oc, grad_accum=accum))
            params, opt, loss = step(params, opt, tokens, targets)
            outs[accum] = (params, float(loss))
        assert abs(outs[1][1] - outs[4][1]) < 1e-5
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5
            ),
            outs[1][0], outs[4][0],
        )

    def test_grad_accum_rejects_indivisible(self):
        cfg = tiny_cfg()
        oc = OptConfig()
        params = init_params(jax.random.PRNGKey(0), cfg)
        step = make_train_step(cfg, oc, grad_accum=3)
        tokens = jnp.zeros((8, 16), jnp.int32)
        with pytest.raises(ValueError, match="not divisible"):
            step(params, init_opt_state(params, oc), tokens, tokens)

    @pytest.mark.slow
    def test_fsdp_parity_and_state_sharding(self):
        """ZeRO-3 (fsdp=True) trains to the same losses as plain dp x tp,
        and each chip holds 1/(dp*tp) of every matrix param + moment."""
        from kfunca_tpu.models.train import make_sharded_train_step
        from kfunca_tpu.parallel.mesh import make_mesh, shard_params

        cfg = tiny_cfg()
        mesh = make_mesh(8)  # dp x tp
        dp, tp = mesh.shape["dp"], mesh.shape["tp"]
        tokens = (jnp.arange(8 * 16, dtype=jnp.int32).reshape(8, 16) * 5) % cfg.vocab_size
        targets = (tokens + 1) % cfg.vocab_size
        oc = OptConfig(lr=1e-2)

        losses = {}
        for fsdp in (False, True):
            params = shard_params(
                init_params(jax.random.PRNGKey(0), cfg), mesh, fsdp=fsdp
            )
            opt = init_opt_state(params, oc)
            step = make_sharded_train_step(cfg, mesh, oc, fsdp=fsdp)(params)
            ls = []
            with mesh:
                for _ in range(3):
                    params, opt, loss = step(params, opt, tokens, targets)
                    ls.append(float(loss))
            losses[fsdp] = ls
            if fsdp:
                w = params["blocks"][0]["wqkv"]
                shard = w.addressable_shards[0].data
                assert shard.size * dp * tp == w.size, (shard.shape, w.shape)
                m = opt["m"]["blocks"][0]["wqkv"]
                assert m.addressable_shards[0].data.size * dp * tp == m.size
        assert np.allclose(losses[False], losses[True], atol=1e-4), losses

    @pytest.mark.slow
    @pytest.mark.parametrize("algo", ["lion", "adafactor"])
    def test_sharded_step_runs(self, algo):
        from kfunca_tpu.models.train import make_sharded_train_step
        from kfunca_tpu.parallel.mesh import make_mesh, shard_params

        cfg = tiny_cfg()
        mesh = make_mesh(8)
        params = shard_params(init_params(jax.random.PRNGKey(0), cfg), mesh)
        oc = OptConfig(algo=algo, lr=1e-2)
        opt = init_opt_state(params, oc)
        tokens = jnp.zeros((4, 16), jnp.int32)
        targets = jnp.ones((4, 16), jnp.int32)
        step = make_sharded_train_step(cfg, mesh, oc)(params)
        with mesh:
            params, opt, l1 = step(params, opt, tokens, targets)
            params, opt, l2 = step(params, opt, tokens, targets)
        assert float(l2) < float(l1)


class TestMuon:
    def test_newton_schulz_orthogonalizes(self):
        """NS5 output of a well-conditioned matrix is near-orthogonal:
        O @ O.T ~ I (the singular values are driven toward 1)."""
        from kfunca_tpu.models.train import _newton_schulz5

        g = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (16, 64)))
        o = np.asarray(_newton_schulz5(jnp.asarray(g, jnp.float32)))
        gram = o @ o.T
        # quintic NS converges loosely (the paper accepts ~[0.7, 1.3])
        sv = np.linalg.svd(o, compute_uv=False)
        assert sv.max() < 1.35 and sv.min() > 0.55, (sv.min(), sv.max())
        assert np.abs(np.diag(gram) - 1.0).max() < 0.5

    def test_tall_matrix_transpose_path(self):
        from kfunca_tpu.models.train import _newton_schulz5

        g = jax.random.normal(jax.random.PRNGKey(1), (64, 16), jnp.float32)
        o = np.asarray(_newton_schulz5(g))
        assert o.shape == (64, 16)
        sv = np.linalg.svd(o, compute_uv=False)
        assert sv.max() < 1.35 and sv.min() > 0.55

    def test_state_layout_and_1d_fallback(self):
        p = _toy_params()
        s = init_opt_state(p, OptConfig(algo="muon"))
        assert set(s) == {"step", "m", "v1"}
        assert s["v1"]["w"].shape == ()  # 2-D leaf: no second moment
        assert s["v1"]["b"].shape == (2,)  # 1-D leaf: adamw fallback state

    def test_loss_decreases(self):
        cfg = tiny_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        oc = OptConfig(algo="muon", lr=3e-3, clip_norm=1.0)
        opt = init_opt_state(params, oc)
        step = jax.jit(make_train_step(cfg, oc))
        tokens = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) * 3) % cfg.vocab_size
        targets = (tokens + 1) % cfg.vocab_size
        losses = []
        for _ in range(6):
            params, opt, loss = step(params, opt, tokens, targets)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses


class TestEMA:
    def test_ema_tracks_params(self):
        from kfunca_tpu.models.train import ema_params

        oc = OptConfig(algo="sgd", lr=0.1, momentum=0.0, weight_decay=0.0,
                       ema_decay=0.5)
        p, g = _toy_params(), _toy_grads()
        s = init_opt_state(p, oc)
        # ema starts AT the params
        assert np.allclose(np.asarray(s["ema"]["w"]), np.asarray(p["w"]))
        p1, s = apply_update(p, g, s, oc)
        want = 0.5 * np.asarray(p["w"]) + 0.5 * np.asarray(p1["w"])
        assert np.allclose(np.asarray(ema_params(s)["w"]), want, atol=1e-6)
        p2, s = apply_update(p1, g, s, oc)
        want = 0.5 * want + 0.5 * np.asarray(p2["w"])
        assert np.allclose(np.asarray(ema_params(s)["w"]), want, atol=1e-6)
        # dtype cast accessor
        assert ema_params(s, jnp.bfloat16)["w"].dtype == jnp.bfloat16

    def test_ema_composes_with_any_algo(self):
        cfg = tiny_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        oc = OptConfig(algo="lion", lr=1e-3, ema_decay=0.9)
        opt = init_opt_state(params, oc)
        step = jax.jit(make_train_step(cfg, oc))
        tokens = jnp.zeros((2, 16), jnp.int32)
        targets = jnp.ones((2, 16), jnp.int32)
        params, opt, _ = step(params, opt, tokens, targets)
        assert "ema" in opt and opt["ema"]["final_norm"].dtype == jnp.float32


class TestTrainMetrics:
    def test_metrics_dict(self):
        from kfunca_tpu.models.train import (
            OptConfig, init_opt_state, make_train_step, schedule_lr,
        )
        from kfunca_tpu.models.transformer import TransformerConfig, init_params

        cfg = TransformerConfig(vocab_size=64, d_model=32, n_heads=2,
                                n_layers=1, d_ff=64, dtype="float32")
        oc = OptConfig(lr=1e-2, warmup_steps=10, total_steps=100, clip_norm=1.0)
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt = init_opt_state(params, oc)
        tokens = (jnp.arange(2 * 8, dtype=jnp.int32).reshape(2, 8) * 3) % 64
        targets = jnp.roll(tokens, -1, axis=1)

        plain = jax.jit(make_train_step(cfg, oc))
        metric = jax.jit(make_train_step(cfg, oc, with_metrics=True))
        p1, o1, loss = plain(params, opt, tokens, targets)
        p2, o2, m = metric(params, opt, tokens, targets)
        assert set(m) == {"loss", "grad_norm", "lr", "step"}
        np.testing.assert_allclose(float(m["loss"]), float(loss), rtol=1e-6)
        assert float(m["grad_norm"]) > 0
        assert int(m["step"]) == 1
        np.testing.assert_allclose(float(m["lr"]), float(schedule_lr(oc, 1)), rtol=1e-6)
        # metrics must not perturb the update itself
        for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_metrics_with_grad_accum(self):
        from kfunca_tpu.models.train import OptConfig, init_opt_state, make_train_step
        from kfunca_tpu.models.transformer import TransformerConfig, init_params

        cfg = TransformerConfig(vocab_size=64, d_model=32, n_heads=2,
                                n_layers=1, d_ff=64, dtype="float32")
        oc = OptConfig(lr=1e-2)
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt = init_opt_state(params, oc)
        tokens = (jnp.arange(4 * 8, dtype=jnp.int32).reshape(4, 8) * 5) % 64
        targets = jnp.roll(tokens, -1, axis=1)
        _, _, m1 = jax.jit(make_train_step(cfg, oc, with_metrics=True))(
            params, opt, tokens, targets)
        _, _, m2 = jax.jit(make_train_step(cfg, oc, grad_accum=2,
                                           with_metrics=True))(
            params, opt, tokens, targets)
        np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(m2["grad_norm"]), float(m1["grad_norm"]),
                                   rtol=1e-4)


class TestStateDtype:
    """OptConfig(state_dtype="bfloat16"): moments stored bf16, computed
    fp32 — halves AdamW's m+v HBM traffic (the optimizer phase is pure
    bandwidth; docs/TRAINING.md).  Contract: storage dtype sticks across
    steps (loop-carry stable) and the trajectory tracks the fp32-state
    one closely at beta2<=0.99."""

    def test_storage_dtype_and_carry_stability(self):
        for algo in ("adamw", "sgd", "lion", "muon", "adafactor"):
            oc = OptConfig(algo=algo, lr=1e-3, state_dtype="bfloat16")
            p = _toy_params()
            s = init_opt_state(p, oc)
            for key in ("m", "v", "v1"):
                if key in s:
                    assert s[key]["b"].dtype == jnp.bfloat16, (algo, key)
            p2, s2 = apply_update(p, _toy_grads(), s, oc)
            # dtypes unchanged after a step => usable as a fori_loop carry
            assert jax.tree_util.tree_all(jax.tree_util.tree_map(
                lambda a, b: a.dtype == b.dtype, s, s2)), algo
            assert p2["w"].dtype == jnp.float32

    def test_adamw_tracks_fp32_trajectory(self):
        oc32 = OptConfig(lr=1e-2, weight_decay=0.1)
        oc16 = OptConfig(lr=1e-2, weight_decay=0.1, state_dtype="bfloat16")
        p32, p16 = _toy_params(), _toy_params()
        s32, s16 = init_opt_state(p32, oc32), init_opt_state(p16, oc16)
        key = jax.random.PRNGKey(3)
        for i in range(20):
            key, k = jax.random.split(key)
            g = {"w": jax.random.normal(k, (2, 2)) * 0.3,
                 "b": jax.random.normal(k, (2,)) * 0.1}
            p32, s32 = apply_update(p32, g, s32, oc32)
            p16, s16 = apply_update(p16, g, s16, oc16)
        for leaf in ("w", "b"):
            a, b = np.asarray(p32[leaf]), np.asarray(p16[leaf])
            np.testing.assert_allclose(b, a, rtol=0, atol=2e-2)

    def test_train_step_loss_decreases_bf16_state(self):
        cfg = tiny_cfg()
        oc = OptConfig(lr=3e-3, state_dtype="bfloat16")
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt = init_opt_state(params, oc)
        step = jax.jit(make_train_step(cfg, oc))
        tokens = (jnp.arange(4 * 16, dtype=jnp.int32).reshape(4, 16) * 7) % 64
        targets = jnp.roll(tokens, -1, axis=1)
        losses = []
        for _ in range(8):
            params, opt, loss = step(params, opt, tokens, targets)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
