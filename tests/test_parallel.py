"""Parallelism tests on the virtual 8-device CPU mesh.

Validates that every sharded execution path is numerically equivalent to
the unsharded single-logical-device computation — the property that makes
"pick a mesh, annotate, let XLA insert collectives" safe.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from kfunca_tpu.models import pipeline_lm
from kfunca_tpu.models.moe import MoEConfig, init_moe_params, moe_ffn
from kfunca_tpu.models.train import init_opt_state, make_sharded_train_step, make_train_step
from kfunca_tpu.models.transformer import TransformerConfig, forward, init_params, loss_fn
from kfunca_tpu.parallel.mesh import make_mesh, shard_params


def tiny_cfg(**kw):
    defaults = dict(
        vocab_size=64, d_model=64, n_heads=2, n_layers=2, d_ff=128, dtype="float32"
    )
    defaults.update(kw)
    return TransformerConfig(**defaults)


class TestDenseSharding:
    def test_forward_parity_sharded_vs_single(self):
        cfg = tiny_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) % cfg.vocab_size
        ref = forward(params, tokens, cfg)

        mesh = make_mesh(8)
        sharded = shard_params(params, mesh)
        with mesh:
            out = jax.jit(lambda p, t: forward(p, t, cfg))(sharded, tokens)
        assert np.allclose(np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4)

    def test_forward_parity_qwen3_and_deepseek_shapes(self):
        """param_specs must cover the session-8 param keys: qk_norm's
        per-head gains, DeepSeek's router_bias / shared experts /
        fine-grained MoE, and the first-k-dense layer mix."""
        for cfg in (
            tiny_cfg(qk_norm=True),
            tiny_cfg(n_experts=4, moe_top_k=2, moe_d_ff=32,
                     n_shared_experts=1, moe_score="sigmoid",
                     moe_score_bias=True, moe_n_group=2, moe_topk_group=1,
                     moe_routed_scale=1.5, moe_first_dense=1),
        ):
            params = init_params(jax.random.PRNGKey(1), cfg)
            tokens = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16)
                      % cfg.vocab_size)
            ref = forward(params, tokens, cfg)
            mesh = make_mesh(8)
            sharded = shard_params(params, mesh)
            with mesh:
                out = jax.jit(lambda p, t, c=cfg: forward(p, t, c))(
                    sharded, tokens)
            assert np.allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-4, rtol=1e-4)

    @pytest.mark.slow
    def test_sharded_train_step_decreases_loss(self):
        cfg = tiny_cfg()
        mesh = make_mesh(8)
        params = shard_params(init_params(jax.random.PRNGKey(0), cfg), mesh)
        opt = init_opt_state(params)
        tokens = jnp.zeros((4, 16), jnp.int32)
        targets = jnp.ones((4, 16), jnp.int32)
        step = make_sharded_train_step(cfg, mesh)(params)
        with mesh:
            params, opt, l1 = step(params, opt, tokens, targets)
            params, opt, l2 = step(params, opt, tokens, targets)
        assert float(l2) < float(l1)


class TestMoE:
    def test_moe_shapes_and_gating(self):
        cfg = MoEConfig(n_experts=4, d_model=32, d_ff=64, capacity_factor=2.0)
        params = init_moe_params(jax.random.PRNGKey(1), cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32), jnp.float32)
        out, aux = moe_ffn(x, params, cfg)
        assert out.shape == x.shape
        assert float(aux) > 0.0

    @pytest.mark.slow
    def test_moe_capacity_drops_overflow(self):
        """With capacity << tokens/expert, output norm shrinks (tokens drop)
        but shapes stay static."""
        cfg_small = MoEConfig(n_experts=2, d_model=16, d_ff=32, capacity_factor=0.1)
        params = init_moe_params(jax.random.PRNGKey(1), cfg_small)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 16), jnp.float32)
        out, _ = moe_ffn(x, params, cfg_small)
        assert out.shape == x.shape
        # most tokens dropped -> many rows exactly zero
        zero_rows = np.sum(np.all(np.asarray(out) == 0, axis=-1))
        assert zero_rows > 0

    def test_top2_matches_dense_mixture_oracle(self):
        """With top_k == n_experts and ample capacity, the routed output
        must equal the full softmax-weighted mixture of every expert's FFN
        (exact dense oracle for the dispatch/combine einsum machinery)."""
        e, dm, ff = 3, 16, 32
        cfg = MoEConfig(n_experts=e, d_model=dm, d_ff=ff, capacity_factor=4.0, top_k=e)
        params = init_moe_params(jax.random.PRNGKey(1), cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, dm), jnp.float32)
        out, _ = moe_ffn(x, params, cfg)

        xt = x.reshape(-1, dm)
        probs = jax.nn.softmax(xt @ params["router"], axis=-1)  # (T, E)
        h = jax.nn.gelu(jnp.einsum("td,edf->tef", xt, params["w_in"]))
        expert_out = jnp.einsum("tef,efd->ted", h, params["w_out"])
        want = jnp.einsum("te,ted->td", probs, expert_out).reshape(x.shape)
        assert np.allclose(np.asarray(out), np.asarray(want), atol=1e-5)

    @pytest.mark.slow
    def test_top2_rank_order_seating(self):
        """First choices are seated before second choices compete: with
        capacity exactly T/E, every token's FIRST choice must survive even
        when second choices target the same experts."""
        e, dm = 2, 8
        cfg = MoEConfig(n_experts=e, d_model=dm, d_ff=16, capacity_factor=1.0, top_k=2)
        params = init_moe_params(jax.random.PRNGKey(1), cfg)
        t = 8
        # capacity = top_k * T / E = 8; rank-0 uses <= 8 per expert -> no
        # rank-0 token may drop, whatever the routing
        x = jax.random.normal(jax.random.PRNGKey(5), (1, t, dm), jnp.float32)
        from kfunca_tpu.models.moe import _topk_dispatch

        xt = x.reshape(-1, dm)
        probs = jax.nn.softmax(xt @ params["router"], axis=-1)
        cap = max(1, int(cfg.capacity_factor * cfg.top_k * t / e))
        dispatch, combine, oh1 = _topk_dispatch(probs, e, cap, 2)
        # every token's rank-0 expert appears in its dispatch row
        kept_rank0 = jnp.einsum("tec,te->t", dispatch, oh1)
        assert np.all(np.asarray(kept_rank0) >= 1.0 - 1e-6)

    def test_top2_gates_renormalized(self):
        """With ample capacity, each token's combine weights sum to 1."""
        e, dm = 4, 8
        cfg = MoEConfig(n_experts=e, d_model=dm, d_ff=16, capacity_factor=4.0, top_k=2)
        params = init_moe_params(jax.random.PRNGKey(1), cfg)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, dm), jnp.float32)
        from kfunca_tpu.models.moe import _topk_dispatch

        xt = x.reshape(-1, dm)
        probs = jax.nn.softmax(xt @ params["router"], axis=-1)
        cap = max(1, int(cfg.capacity_factor * cfg.top_k * 8 / e))
        _, combine, _ = _topk_dispatch(probs, e, cap, 2)
        sums = np.asarray(jnp.sum(combine, axis=(1, 2)))
        assert np.allclose(sums, 1.0, atol=1e-6)


class TestPipeline:
    def test_pipeline_matches_sequential(self):
        """Pipelined forward == applying the blocks sequentially."""
        cfg = pipeline_lm.PipelineMoEConfig(
            vocab_size=64,
            d_model=64,
            n_heads=2,
            n_layers=4,
            n_experts=2,
            d_ff=64,
            n_stages=2,
            n_microbatches=2,
            dtype="float32",
        )
        params = pipeline_lm.init_params(jax.random.PRNGKey(0), cfg)
        tokens = (jnp.arange(4 * 16, dtype=jnp.int32).reshape(4, 16) * 7) % cfg.vocab_size
        targets = (tokens + 1) % cfg.vocab_size

        # sequential reference: unstack stages back into a flat layer list.
        # MoE routing/capacity is a *per-group* computation, so the reference
        # must process the same microbatch groups the pipeline does.
        stages = params["stages"]
        b, s_len = tokens.shape
        mb = b // cfg.n_microbatches
        chunks = []
        for i in range(cfg.n_microbatches):
            x = params["embed"][tokens[i * mb : (i + 1) * mb]].astype(cfg.act_dtype)
            for s in range(cfg.n_stages):
                for l in range(cfg.n_layers // cfg.n_stages):
                    layer = jax.tree_util.tree_map(lambda a: a[s, l], stages)
                    x = pipeline_lm.block_fn(cfg, layer, x)
            chunks.append(x)
        x = jnp.concatenate(chunks, axis=0)
        from kfunca_tpu.models.transformer import rms_norm

        y = rms_norm(x, params["final_norm"])
        logits = jnp.dot(y, params["embed"].T.astype(y.dtype))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ref_loss = -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))

        mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2, 2), ("dp", "pp", "tp"))
        loss_fn_pp = pipeline_lm.make_loss_fn(cfg, mesh)
        with mesh:
            pp_loss = jax.jit(loss_fn_pp)(params, tokens, targets)
        assert np.allclose(float(ref_loss), float(pp_loss), atol=1e-4), (
            float(ref_loss),
            float(pp_loss),
        )

    @pytest.mark.slow
    def test_pipeline_remat_parity(self):
        """remat=True (microbatch checkpointing) must not change the math:
        identical outputs and gradients, only the backward memory policy."""
        from kfunca_tpu.parallel.pipeline import make_pipelined_forward

        mesh = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
        d = 8
        block_fn = lambda p, x: jnp.tanh(x @ p)  # noqa: E731
        params = jax.random.normal(jax.random.PRNGKey(0), (2, 2, d, d), jnp.float32)
        x_mb = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 4, d), jnp.float32)

        outs, grads = {}, {}
        for remat in (False, True):
            fn = make_pipelined_forward(block_fn, mesh, remat=remat)

            def loss(p, x):
                return jnp.sum(fn(p, x) ** 2)

            with mesh:
                outs[remat] = jax.jit(fn)(params, x_mb)
                grads[remat] = jax.jit(jax.grad(loss))(params, x_mb)
        assert np.allclose(np.asarray(outs[False]), np.asarray(outs[True]), atol=1e-6)
        assert np.allclose(np.asarray(grads[False]), np.asarray(grads[True]), atol=1e-5)

    @pytest.mark.slow
    def test_pipeline_train_step(self):
        cfg = pipeline_lm.PipelineMoEConfig(dtype="float32")
        mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2, 2), ("dp", "pp", "tp"))
        params = pipeline_lm.init_params(jax.random.PRNGKey(0), cfg)
        step = pipeline_lm.make_train_step(cfg, mesh)
        tokens = jnp.zeros((4, 32), jnp.int32)
        targets = jnp.ones((4, 32), jnp.int32)
        with mesh:
            params, l1 = step(params, tokens, targets)
            params, l2 = step(params, tokens, targets)
        assert float(l2) < float(l1)


class TestExplicitAllToAllMoE:
    def test_ep_alltoall_matches_replicated(self):
        """The explicit all_to_all expert-parallel MoE must reproduce the
        replicated moe_ffn exactly when capacity is ample (no drops):
        per-token outputs are independent of queue positions, so sharding
        tokens 8-way and scattering experts changes nothing numerically."""
        from kfunca_tpu.models.moe import make_moe_ffn_ep

        cfg = MoEConfig(n_experts=8, d_model=32, d_ff=64, capacity_factor=8.0, top_k=2)
        params = init_moe_params(jax.random.PRNGKey(1), cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 4, 32), jnp.float32)

        want, _ = moe_ffn(x, params, cfg)

        mesh = Mesh(np.asarray(jax.devices()), ("ep",))
        fn = make_moe_ffn_ep(mesh, cfg)
        with mesh:
            got, aux = jax.jit(fn)(x, params)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5), (
            np.abs(np.asarray(got) - np.asarray(want)).max()
        )

    @pytest.mark.slow
    def test_ep_alltoall_differentiable(self):
        from kfunca_tpu.models.moe import make_moe_ffn_ep

        cfg = MoEConfig(n_experts=8, d_model=16, d_ff=32, capacity_factor=4.0)
        params = init_moe_params(jax.random.PRNGKey(1), cfg)
        x = jax.random.normal(jax.random.PRNGKey(3), (8, 4, 16), jnp.float32)
        mesh = Mesh(np.asarray(jax.devices()), ("ep",))
        fn = make_moe_ffn_ep(mesh, cfg)

        def loss(p):
            with mesh:
                out, aux = fn(x, p)
            return jnp.sum(out**2) + jnp.mean(aux)

        grads = jax.jit(jax.grad(loss))(params)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert bool(jnp.isfinite(leaf).all())
        assert float(jnp.abs(grads["w_in"]).max()) > 0


class TestInterleavedPipeline:
    def test_interleaved_matches_sequential(self):
        """v=2 virtual stages per device over the 4-way pp mesh: the
        interleaved schedule's output must equal sequentially applying all
        layers in order (virtual stage j = layers [j*per:(j+1)*per] on
        device j % n as chunk j // n)."""
        from jax.sharding import Mesh

        from kfunca_tpu.parallel.pipeline import (
            make_interleaved_pipeline,
            stack_stages_interleaved,
        )

        n_stages, v, n_layers = 4, 2, 8
        m, mb, s_len, dm = 4, 2, 8, 16
        key = jax.random.PRNGKey(0)
        layers = []
        for i in range(n_layers):
            k1, k2, key = jax.random.split(key, 3)
            layers.append({
                "w": jax.random.normal(k1, (dm, dm), jnp.float32) * 0.3,
                "b": jax.random.normal(k2, (dm,), jnp.float32) * 0.1,
            })

        def block_fn(p, x):
            return jnp.tanh(x @ p["w"] + p["b"])

        x_mb = jax.random.normal(key, (m, mb, s_len, dm), jnp.float32)

        # sequential oracle
        ref = []
        for i in range(m):
            h = x_mb[i]
            for layer in layers:
                h = block_fn(layer, h)
            ref.append(h)
        ref = jnp.stack(ref)

        mesh = Mesh(np.asarray(jax.devices()[:n_stages]), ("pp",))
        stacked = stack_stages_interleaved(layers, n_stages, v)
        fn = make_interleaved_pipeline(block_fn, mesh, v=v)
        with mesh:
            got = fn(stacked, x_mb)
        assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5), (
            np.abs(np.asarray(got) - np.asarray(ref)).max()
        )

    def test_interleaved_differentiable(self):
        """The AD transpose of the interleaved schedule trains: grads flow
        to every chunk's params on every device."""
        from jax.sharding import Mesh

        from kfunca_tpu.parallel.pipeline import (
            make_interleaved_pipeline,
            stack_stages_interleaved,
        )

        n_stages, v, n_layers = 2, 2, 4
        m, mb, s_len, dm = 2, 2, 4, 8
        key = jax.random.PRNGKey(1)
        layers = []
        for i in range(n_layers):
            k1, key = jax.random.split(key)
            layers.append({"w": jax.random.normal(k1, (dm, dm), jnp.float32) * 0.3})

        def block_fn(p, x):
            return jnp.tanh(x @ p["w"])

        x_mb = jax.random.normal(key, (m, mb, s_len, dm), jnp.float32)
        mesh = Mesh(np.asarray(jax.devices()[:n_stages]), ("pp",))
        stacked = stack_stages_interleaved(layers, n_stages, v)
        fn = make_interleaved_pipeline(block_fn, mesh, v=v, remat=True)

        def loss(params):
            return jnp.sum(fn(params, x_mb) ** 2)

        with mesh:
            # remat's closed_call requires a jit around the shard_map
            g = jax.jit(jax.grad(loss))(stacked)
        gw = np.asarray(g["w"])  # (n, v, per, dm, dm)
        assert gw.shape[:2] == (n_stages, v)
        for d in range(n_stages):
            for c in range(v):
                assert np.abs(gw[d, c]).max() > 0, (d, c)


class TestMoERescue:
    def test_rescue_seats_dropped_tokens(self):
        """With capacity forced tiny, rescue ranks seat tokens the plain
        top-1 router drops — without ever exceeding per-expert capacity."""
        from kfunca_tpu.models.moe import MoEConfig, _topk_dispatch

        t, e, cap = 16, 4, 2  # 16 tokens into 4*2=8 seats: heavy overflow
        key = jax.random.PRNGKey(0)
        probs = jax.nn.softmax(jax.random.normal(key, (t, e)) * 3.0, axis=-1)
        d0, c0, _ = _topk_dispatch(probs, e, cap, top_k=1, rescue_ranks=0)
        d2, c2, _ = _topk_dispatch(probs, e, cap, top_k=1, rescue_ranks=2)
        seated0 = int(jnp.sum(jnp.sum(d0, axis=(1, 2)) > 0))
        seated2 = int(jnp.sum(jnp.sum(d2, axis=(1, 2)) > 0))
        assert seated2 > seated0, (seated0, seated2)
        # capacity is never exceeded and slots are never double-booked
        per_slot = jnp.sum(d2, axis=0)  # (E, cap)
        assert float(per_slot.max()) <= 1.0 + 1e-6
        # tokens seated by the base pass keep their assignment
        base_tokens = jnp.sum(d0, axis=(1, 2)) > 0
        same = jnp.where(base_tokens[:, None, None], d2 - d0, 0.0)
        assert float(jnp.abs(same).max()) == 0.0

    @pytest.mark.slow
    def test_rescue_moe_ffn_differentiable(self):
        from kfunca_tpu.models.moe import MoEConfig, init_moe_params, moe_ffn

        cfg = MoEConfig(n_experts=4, capacity_factor=0.5, d_model=16, d_ff=32,
                        top_k=1, rescue_ranks=1)
        params = init_moe_params(jax.random.PRNGKey(1), cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16), jnp.float32)

        def loss(p):
            out, aux = moe_ffn(x, p, cfg)
            return jnp.sum(out ** 2) + 0.01 * aux

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["router"]).max()) > 0
        assert float(jnp.abs(g["w_in"]).max()) > 0


class TestExpertChoice:
    def test_matches_dense_oracle(self):
        """With capacity == n_tokens every expert picks every token, so the
        output equals the full softmax-weighted mixture (dense oracle)."""
        from kfunca_tpu.models.moe import MoEConfig, expert_choice_ffn, init_moe_params

        e, dm, ff = 3, 16, 32
        cfg = MoEConfig(n_experts=e, d_model=dm, d_ff=ff,
                        capacity_factor=float(e), top_k=1)  # cap = T
        params = init_moe_params(jax.random.PRNGKey(1), cfg)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, dm), jnp.float32)
        out, aux = expert_choice_ffn(x, params, cfg)
        assert float(aux) == 0.0

        xt = x.reshape(-1, dm)
        probs = jax.nn.softmax(xt @ params["router"], axis=-1)
        hmid = jax.nn.gelu(jnp.einsum("td,edf->tef", xt, params["w_in"]))
        eo = jnp.einsum("tef,efd->ted", hmid, params["w_out"])
        want = jnp.einsum("te,ted->td", probs, eo).reshape(x.shape)
        assert np.allclose(np.asarray(out), np.asarray(want), atol=1e-5), (
            np.abs(np.asarray(out) - np.asarray(want)).max()
        )

    def test_perfect_load_balance_and_shapes(self):
        """Every expert processes exactly `cap` tokens regardless of routing
        skew (the property expert choice exists for)."""
        from kfunca_tpu.models.moe import MoEConfig, expert_choice_ffn, init_moe_params

        cfg = MoEConfig(n_experts=4, d_model=16, d_ff=32, capacity_factor=0.5)
        params = init_moe_params(jax.random.PRNGKey(3), cfg)
        # heavily skewed inputs (all tokens nearly identical): token-choice
        # routing would overflow one expert; expert choice cannot
        x = jnp.ones((2, 16, 16), jnp.float32) + 0.01 * jax.random.normal(
            jax.random.PRNGKey(4), (2, 16, 16)
        )
        out, _ = expert_choice_ffn(x, params, cfg)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_differentiable(self):
        from kfunca_tpu.models.moe import MoEConfig, expert_choice_ffn, init_moe_params

        cfg = MoEConfig(n_experts=2, d_model=8, d_ff=16, capacity_factor=1.0)
        params = init_moe_params(jax.random.PRNGKey(5), cfg)
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8), jnp.float32)

        def loss(p):
            out, _ = expert_choice_ffn(x, p, cfg)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["router"]).max()) > 0
        assert float(jnp.abs(g["w_in"]).max()) > 0


class TestZeroBubblePipeline:
    """ZB-H1-style hand-scheduled pipeline: schedule-table audit + loss and
    gradient parity vs the sequential (single-device) oracle."""

    def test_schedule_tables_valid(self):
        from kfunca_tpu.parallel.zero_bubble import (
            OP_B, OP_F, OP_W, schedule_cost, validate_schedule, zb_schedule,
        )

        for n, m in [(2, 2), (2, 6), (4, 4), (4, 8), (8, 8), (3, 7)]:
            sched = zb_schedule(n, m)
            validate_schedule(sched, m)
            # every device executes exactly m of each op kind
            for op in (OP_F, OP_B, OP_W):
                assert ((sched == op).sum(axis=1) == m).all(), (n, m, op)
            cost = schedule_cost(n, m)
            # W deferral must beat the naive serial bound 3m + handoffs: the
            # last device alone needs >= 3m ticks, warmup adds n-1
            assert cost["zb_ticks"] >= 3 * m + n - 1
            # and the realized bubble stays small: busy fraction over the
            # WHOLE table at least matches 3m/(3m + 3(n-1)) (H1-class)
            assert cost["zb_busy_frac"] >= (3 * m) / (3 * m + 3 * (n - 1)) - 1e-9

    @pytest.mark.slow
    def test_zb_matches_sequential_grads(self):
        """Hand-scheduled F/B/W pipeline == jax.grad of the sequential
        stack, for loss AND parameter gradients."""
        from kfunca_tpu.parallel.pipeline import stack_stages
        from kfunca_tpu.parallel.zero_bubble import make_zb_train_step

        n_stages, n_micro = 4, 6
        mb, dim = 4, 32
        rng = np.random.default_rng(0)

        def layer_init():
            return {
                "w": jnp.asarray(rng.standard_normal((dim, dim)) * 0.2, jnp.float32),
                "b": jnp.asarray(rng.standard_normal((dim,)) * 0.1, jnp.float32),
            }

        layers = [layer_init() for _ in range(n_stages * 2)]  # 2 layers/stage
        stacked = stack_stages(layers, n_stages)

        def stage_fn(stage_params, x):
            def body(h, lp):
                return jnp.tanh(h @ lp["w"] + lp["b"]), None

            h, _ = jax.lax.scan(body, x, stage_params)
            return h

        targets = jnp.asarray(rng.standard_normal((n_micro, mb, dim)), jnp.float32)

        def loss_fn(y, i):
            t = jax.lax.dynamic_index_in_dim(targets, i, 0, keepdims=False)
            return jnp.sum((y.astype(jnp.float32) - t) ** 2)

        x_mb = jnp.asarray(rng.standard_normal((n_micro, mb, dim)), jnp.float32)

        mesh = Mesh(np.asarray(jax.devices()[:n_stages]), ("pp",))
        step = make_zb_train_step(stage_fn, loss_fn, mesh, n_micro=n_micro)
        with mesh:
            loss, grads = jax.jit(step)(stacked, x_mb)

        # sequential oracle: same stacked params, summed microbatch losses
        def seq_loss(stacked_p):
            total = jnp.float32(0.0)
            for i in range(n_micro):
                x = x_mb[i]
                for s in range(n_stages):
                    sp = jax.tree_util.tree_map(lambda a: a[s], stacked_p)
                    x = stage_fn(sp, x)
                total = total + jnp.sum((x - targets[i]) ** 2)
            return total

        want_loss, want_grads = jax.value_and_grad(seq_loss)(stacked)
        assert np.allclose(float(loss), float(want_loss), rtol=1e-5), (
            float(loss), float(want_loss)
        )
        flat_g, _ = jax.tree_util.tree_flatten(grads)
        flat_w, _ = jax.tree_util.tree_flatten(want_grads)
        for g, w in zip(flat_g, flat_w):
            assert np.allclose(np.asarray(g), np.asarray(w), atol=1e-4), (
                np.abs(np.asarray(g) - np.asarray(w)).max()
            )


class TestZBVPipeline:
    """ZB-V: two chunks per device in a V pattern — schedule audit, memory-
    balance property, and loss/grad parity vs the sequential oracle."""

    def test_zbv_schedule_tables_valid(self):
        from kfunca_tpu.parallel.zero_bubble import (
            ZV_B0, ZV_B1, ZV_F0, ZV_F1, ZV_W0, ZV_W1,
            validate_zbv_schedule, zbv_schedule, zbv_schedule_cost,
        )

        for n, m in [(2, 2), (2, 6), (4, 4), (4, 8), (3, 7), (8, 8)]:
            sched = zbv_schedule(n, m)
            validate_zbv_schedule(sched, m)
            for op in (ZV_F0, ZV_F1, ZV_B1, ZV_B0, ZV_W1, ZV_W0):
                assert ((sched == op).sum(axis=1) == m).all(), (n, m, op)
            cost = zbv_schedule_cost(n, m)
            assert cost["zbv_ticks"] >= 6 * m
            # the V's warmup is half the mesh: busy fraction at least the
            # H1-class bound with n-1 replaced by ~2(n-1) tick handoffs
            assert cost["zbv_busy_frac"] >= (6 * m) / (6 * m + 6 * (n - 1)) - 1e-9

    def test_zbv_memory_balance(self):
        """Peak in-flight (F done, B pending) activations per device stays
        within the ~2N 1F1B bound on EVERY device — the property the V
        layout buys over ZB-H1's N-d skew."""
        from kfunca_tpu.parallel.zero_bubble import (
            ZV_B0, ZV_B1, ZV_F0, ZV_F1, zbv_schedule,
        )

        n, m = 4, 12
        sched = zbv_schedule(n, m)
        for d in range(n):
            live = peak = 0
            for t in range(sched.shape[1]):
                op = sched[d, t]
                live += int(op in (ZV_F0, ZV_F1)) - int(op in (ZV_B0, ZV_B1))
                peak = max(peak, live)
            assert peak <= 2 * n + 1, (d, peak)

    def test_zbv_matches_sequential_grads(self):
        """The V-scheduled F0/F1/B1/B0/W1/W0 pipeline == jax.grad of the
        sequential 2N-stage stack, for loss AND parameter gradients."""
        from kfunca_tpu.parallel.zero_bubble import (
            make_zbv_train_step, stack_stages_v,
        )

        n_stages, n_micro = 4, 6
        mb, dim = 4, 32
        rng = np.random.default_rng(1)

        def stage_init():
            return {
                "w": jnp.asarray(rng.standard_normal((dim, dim)) * 0.2, jnp.float32),
                "b": jnp.asarray(rng.standard_normal((dim,)) * 0.1, jnp.float32),
            }

        stages = [stage_init() for _ in range(2 * n_stages)]
        stacked = stack_stages_v(stages, n_stages)  # (n, 2, ...)

        def stage_fn(sp, x):
            return jnp.tanh(x @ sp["w"] + sp["b"])

        targets = jnp.asarray(rng.standard_normal((n_micro, mb, dim)), jnp.float32)

        def loss_fn(y, i):
            t = jax.lax.dynamic_index_in_dim(targets, i, 0, keepdims=False)
            return jnp.sum((y.astype(jnp.float32) - t) ** 2)

        x_mb = jnp.asarray(rng.standard_normal((n_micro, mb, dim)), jnp.float32)

        mesh = Mesh(np.asarray(jax.devices()[:n_stages]), ("pp",))
        step = make_zbv_train_step(stage_fn, loss_fn, mesh, n_micro=n_micro)
        with mesh:
            loss, grads = jax.jit(step)(stacked, x_mb)

        # sequential oracle over the V order: stage s = stages[s] applied
        # 0..2N-1 (stack_stages_v places stage s at [min(s, 2N-1-s)-ish
        # device, chunk]; walk the same params via the stacked layout)
        def seq_loss(stacked_p):
            total = jnp.float32(0.0)
            for i in range(n_micro):
                x = x_mb[i]
                for s in range(2 * n_stages):
                    d = s if s < n_stages else 2 * n_stages - 1 - s
                    c = 0 if s < n_stages else 1
                    sp = jax.tree_util.tree_map(lambda a: a[d, c], stacked_p)
                    x = stage_fn(sp, x)
                total = total + jnp.sum((x - targets[i]) ** 2)
            return total

        want_loss, want_grads = jax.value_and_grad(seq_loss)(stacked)
        assert np.allclose(float(loss), float(want_loss), rtol=1e-5), (
            float(loss), float(want_loss)
        )
        flat_g, _ = jax.tree_util.tree_flatten(grads)
        flat_w, _ = jax.tree_util.tree_flatten(want_grads)
        for g, w in zip(flat_g, flat_w):
            assert np.allclose(np.asarray(g), np.asarray(w), atol=1e-4), (
                np.abs(np.asarray(g) - np.asarray(w)).max()
            )
