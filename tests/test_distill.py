"""Knowledge distillation: chunked KD-KL parity with the materializing oracle.

The streamed two-head KL (models/distill.py) must match the naive
full-logits computation in value and gradient — same fp32-accumulated
matmuls, only chunked with an online max-domain accumulator.  Cases cover
chunk == V / chunk < V / ragged chunks, temperature, different
student/teacher widths, identical-distribution zero, and the train-step
wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.distill import (
    chunked_kd_kl,
    distill_loss,
    make_distill_step,
)
from kfunca_tpu.models.train import OptConfig, init_opt_state
from kfunca_tpu.models.transformer import TransformerConfig, init_params


def _naive_kl(x_s, w_s, x_t, w_t, tau=1.0):
    z_s = jnp.dot(x_s, w_s, preferred_element_type=jnp.float32) / tau
    z_t = jnp.dot(x_t, w_t, preferred_element_type=jnp.float32) / tau
    lp_s = jax.nn.log_softmax(z_s.astype(jnp.float32), axis=-1)
    lp_t = jax.nn.log_softmax(z_t.astype(jnp.float32), axis=-1)
    return jnp.sum(jnp.exp(lp_t) * (lp_t - lp_s), axis=-1)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


class TestChunkedKdKl:
    @pytest.mark.parametrize("chunk", [100, 32, 48])  # ==V, divides-ish, ragged
    def test_value_matches_naive(self, chunk):
        rng = np.random.default_rng(0)
        n, d, v = 64, 16, 100
        x_s, w_s = _rand(rng, n, d), _rand(rng, d, v)
        x_t, w_t = _rand(rng, n, d), _rand(rng, d, v)
        got = chunked_kd_kl(x_s, w_s, x_t, w_t, chunk)
        want = _naive_kl(x_s, w_s, x_t, w_t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
        assert np.all(np.asarray(got) >= -1e-6)  # KL >= 0

    def test_temperature(self):
        rng = np.random.default_rng(1)
        n, d, v = 32, 8, 50
        x_s, w_s = _rand(rng, n, d), _rand(rng, d, v)
        x_t, w_t = _rand(rng, n, d), _rand(rng, d, v)
        got = chunked_kd_kl(x_s, w_s, x_t, w_t, 16, 2.5)
        want = _naive_kl(x_s, w_s, x_t, w_t, tau=2.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_different_widths(self):
        # student narrower than teacher — the usual distillation setup
        rng = np.random.default_rng(2)
        n, d_s, d_t, v = 16, 8, 24, 37
        x_s, w_s = _rand(rng, n, d_s), _rand(rng, d_s, v)
        x_t, w_t = _rand(rng, n, d_t), _rand(rng, d_t, v)
        got = chunked_kd_kl(x_s, w_s, x_t, w_t, 16)
        want = _naive_kl(x_s, w_s, x_t, w_t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(3)
        n, d, v = 16, 8, 40
        x, w = _rand(rng, n, d), _rand(rng, d, v)
        got = chunked_kd_kl(x, w, x, w, 16)
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-5)

    @pytest.mark.parametrize("tau", [1.0, 3.0])
    def test_gradients_match_naive(self, tau):
        rng = np.random.default_rng(4)
        n, d, v = 24, 8, 50
        x_s, w_s = _rand(rng, n, d), _rand(rng, d, v)
        x_t, w_t = _rand(rng, n, d), _rand(rng, d, v)
        g = _rand(rng, n)  # non-uniform upstream cotangent

        def chunked(xs, ws):
            return jnp.sum(chunked_kd_kl(xs, ws, x_t, w_t, 16, tau) * g)

        def naive(xs, ws):
            return jnp.sum(_naive_kl(xs, ws, x_t, w_t, tau) * g)

        gx_c, gw_c = jax.grad(chunked, argnums=(0, 1))(x_s, w_s)
        gx_n, gw_n = jax.grad(naive, argnums=(0, 1))(x_s, w_s)
        np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_n),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_n),
                                   rtol=1e-4, atol=1e-6)

    def test_teacher_cotangents_zero(self):
        rng = np.random.default_rng(5)
        n, d, v = 8, 4, 20
        x_s, w_s = _rand(rng, n, d), _rand(rng, d, v)
        x_t, w_t = _rand(rng, n, d), _rand(rng, d, v)
        gx_t, gw_t = jax.grad(
            lambda xt, wt: jnp.sum(chunked_kd_kl(x_s, w_s, xt, wt, 8)),
            argnums=(0, 1))(x_t, w_t)
        assert np.all(np.asarray(gx_t) == 0.0)
        assert np.all(np.asarray(gw_t) == 0.0)


class TestDistillStep:
    def _cfgs(self):
        t_cfg = TransformerConfig(vocab_size=101, d_model=32, n_heads=2,
                                  n_layers=2, d_ff=64, max_seq_len=32,
                                  dtype="float32")
        s_cfg = TransformerConfig(vocab_size=101, d_model=16, n_heads=2,
                                  n_layers=1, d_ff=32, max_seq_len=32,
                                  dtype="float32")
        return t_cfg, s_cfg

    def test_step_trains_student(self):
        t_cfg, s_cfg = self._cfgs()
        key = jax.random.PRNGKey(0)
        teacher = init_params(jax.random.fold_in(key, 0), t_cfg)
        student = init_params(jax.random.fold_in(key, 1), s_cfg)
        oc = OptConfig(lr=1e-2, warmup_steps=0, weight_decay=0.0)
        opt_state = init_opt_state(student, oc)
        step = jax.jit(make_distill_step(teacher, t_cfg, s_cfg, oc,
                                         alpha=0.7, tau=2.0, vocab_chunk=32))
        rng = np.random.default_rng(6)
        tokens = jnp.asarray(rng.integers(0, 101, (2, 16)), jnp.int32)
        targets = jnp.asarray(rng.integers(0, 101, (2, 16)), jnp.int32)
        targets = targets.at[0, :4].set(-100)  # masked prompt positions
        losses = []
        for _ in range(5):
            student, opt_state, m = step(student, opt_state, tokens, targets)
            assert np.isfinite(float(m["loss"]))
            assert float(m["kd"]) >= -1e-5
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]  # the student moves toward the blend

    def test_alpha_zero_is_pure_ce(self):
        # with alpha = 0 the objective must equal the masked CE exactly
        t_cfg, s_cfg = self._cfgs()
        key = jax.random.PRNGKey(1)
        teacher = init_params(jax.random.fold_in(key, 0), t_cfg)
        student = init_params(jax.random.fold_in(key, 1), s_cfg)
        rng = np.random.default_rng(7)
        tokens = jnp.asarray(rng.integers(0, 101, (2, 8)), jnp.int32)
        targets = jnp.asarray(rng.integers(0, 101, (2, 8)), jnp.int32)
        from kfunca_tpu.models.transformer import loss_fn_chunked

        loss_v, m = distill_loss(student, teacher, tokens, targets,
                                 s_cfg, t_cfg, alpha=0.0, tau=4.0,
                                 vocab_chunk=32)
        want = loss_fn_chunked(student, tokens, targets, s_cfg,
                               vocab_chunk=32, ignore_index=-100)
        np.testing.assert_allclose(float(loss_v), float(want), rtol=1e-6)
        np.testing.assert_allclose(float(loss_v), float(m["ce"]), rtol=1e-6)
