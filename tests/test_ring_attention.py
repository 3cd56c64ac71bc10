"""Ring attention (context parallelism) vs single-device causal oracle."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kfunca_tpu.parallel.ring_attention import make_ring_attention


def sdpa_oracle(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    sq, skv = q.shape[2], k.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
    s = jnp.where(col <= row, s, -jnp.inf)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


def cp_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("cp",))


class TestRingAttention:
    def test_forward_matches_oracle(self):
        rng = np.random.default_rng(0)
        b, h, s, d = 2, 2, 64, 32  # s sharded 8-way -> 8 tokens per device
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float32)
        mesh = cp_mesh()
        ring = make_ring_attention(mesh)
        spec = NamedSharding(mesh, P(None, None, "cp", None))
        qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
        with mesh:
            out = jax.jit(ring)(qs, ks, vs)
        ref = sdpa_oracle(q, k, v)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_backward_matches_oracle(self):
        """jax.grad through the ring (ppermute+scan transpose) == oracle grads."""
        rng = np.random.default_rng(1)
        b, h, s, d = 1, 2, 32, 16
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float32)
        g = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float32)
        mesh = cp_mesh()
        ring = make_ring_attention(mesh)

        def ring_loss(q, k, v):
            return jnp.sum(ring(q, k, v) * g)

        def ref_loss(q, k, v):
            return jnp.sum(sdpa_oracle(q, k, v) * g)

        with mesh:
            dq, dk, dv = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
        rdq, rdk, rdv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in ((dq, rdq), (dk, rdk), (dv, rdv)):
            assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5)


class TestFusedHopKernel:
    def test_hop_matches_block_attend_oracle(self):
        """The fused Pallas hop (interpret mode) must reproduce the einsum
        hop math exactly across diagonal / past / future shard positions."""
        import math

        from kfunca_tpu.ops.pallas_kernels.ring_hop import (
            flash_attention_hop,
            hop_carry_init,
            hop_finalize,
        )
        from kfunca_tpu.parallel.ring_attention import NEG_INF, _block_attend

        b, h, s_local, d = 1, 2, 128, 128
        key = jax.random.PRNGKey(0)
        q, k0, v0, k1, v1 = (
            jax.random.normal(kk, (b, h, s_local, d), jnp.float32)
            for kk in jax.random.split(key, 5)
        )
        scale = 1.0 / math.sqrt(d)

        # oracle: device idx=1 of a 2-ring (q_off=128) sees shard 1 (diag)
        # then shard 0 (fully past); plus a future shard as a no-op check
        m = jnp.full((b, h, s_local, 1), NEG_INF, jnp.float32)
        l = jnp.zeros_like(m)
        acc = jnp.zeros((b, h, s_local, d), jnp.float32)
        m, l, acc = _block_attend(q, k1, v1, 128, 128, m, l, acc, scale)
        m, l, acc = _block_attend(q, k0, v0, 128, 0, m, l, acc, scale)
        want = acc / jnp.where(l == 0.0, 1.0, l)

        qs = q * scale
        mk, lk, acck = hop_carry_init(b, h, s_local, d)
        for kk, vv, off in [(k1, v1, 128), (k0, v0, 0)]:
            mk, lk, acck = flash_attention_hop(
                qs, kk, vv, mk, lk, acck,
                jnp.int32(128), jnp.int32(off), interpret=True,
            )
        got = hop_finalize(lk, acck, b, h, s_local, d, jnp.float32)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5), (
            np.abs(np.asarray(got) - np.asarray(want)).max()
        )

    def test_hop_future_shard_is_noop(self):
        """A kv shard entirely in the q rows' future must leave the carry
        unchanged (all-masked hop)."""
        from kfunca_tpu.ops.pallas_kernels.ring_hop import (
            flash_attention_hop,
            hop_carry_init,
        )

        b, h, s_local, d = 1, 1, 128, 128
        key = jax.random.PRNGKey(1)
        q, k, v = (
            jax.random.normal(kk, (b, h, s_local, d), jnp.float32)
            for kk in jax.random.split(key, 3)
        )
        m0, l0, acc0 = hop_carry_init(b, h, s_local, d)
        # first a valid diagonal hop to seed the carry
        m1, l1, acc1 = flash_attention_hop(
            q, k, v, m0, l0, acc0, jnp.int32(0), jnp.int32(0), interpret=True
        )
        # then a hop whose kv shard starts AFTER every q row
        m2, l2, acc2 = flash_attention_hop(
            q, k, v, m1, l1, acc1, jnp.int32(0), jnp.int32(128), interpret=True
        )
        assert np.allclose(np.asarray(m1), np.asarray(m2))
        assert np.allclose(np.asarray(l1), np.asarray(l2))
        assert np.allclose(np.asarray(acc1), np.asarray(acc2))

    @pytest.mark.slow
    def test_ring_fused_path_matches_einsum_under_mesh(self):
        """Full fused ring (interpret kernels) == einsum ring under an
        8-way cp mesh, forward values."""
        from kfunca_tpu.parallel.ring_attention import ring_attention_spmd
        from kfunca_tpu.ops.pallas_kernels import ring_hop

        # force interpret mode inside the mesh (CPU backend)
        orig = ring_hop.flash_attention_hop
        import functools

        patched = functools.partial(orig, interpret=True)
        ring_hop.flash_attention_hop = patched
        try:
            from functools import partial

            from jax.sharding import Mesh, PartitionSpec as P

            mesh = Mesh(np.asarray(jax.devices()), ("cp",))
            spec = P(None, None, "cp", None)
            b, h, s, d = 1, 2, 8 * 128, 128
            key = jax.random.PRNGKey(2)
            q, k, v = (
                jax.random.normal(kk, (b, h, s, d), jnp.float32)
                for kk in jax.random.split(key, 3)
            )
            fns = {}
            for use_kernel in (False, True):
                fns[use_kernel] = jax.shard_map(
                    partial(ring_attention_spmd, axis="cp", use_kernel=use_kernel),
                    mesh=mesh,
                    in_specs=(spec, spec, spec),
                    out_specs=spec,
                    axis_names=frozenset({"cp"}),
                    check_vma=False,
                )
            with mesh:
                ref = fns[False](q, k, v)
                got = fns[True](q, k, v)
            assert np.allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
        finally:
            ring_hop.flash_attention_hop = orig

    def test_bwd_hop_all_future_is_noop(self):
        """A backward hop whose kv shard is entirely in the q rows' future
        must leave every accumulator unchanged (p underflows to exact 0)."""
        import math

        from kfunca_tpu.ops.pallas_kernels.ring_hop import (
            bwd_carry_init,
            flash_attention_bwd_hop,
            lane_replicate_rows,
        )

        b, h, s_local, d = 1, 1, 128, 128
        key = jax.random.PRNGKey(3)
        q, k, v, g = (
            jax.random.normal(kk, (b, h, s_local, d), jnp.float32)
            for kk in jax.random.split(key, 4)
        )
        scale = 1.0 / math.sqrt(d)
        lse = lane_replicate_rows(jnp.zeros((b, h, s_local)), b, h, s_local, s_local)
        delta = lane_replicate_rows(jnp.zeros((b, h, s_local)), b, h, s_local, s_local)
        dq0, dk0, dv0 = bwd_carry_init(b, h, s_local, s_local, d)
        dq, dk, dv = flash_attention_bwd_hop(
            q * scale, k, v, g, lse, delta, dq0, dk0, dv0,
            jnp.int32(0), jnp.int32(1024), interpret=True,  # kv fully future
        )
        assert np.allclose(np.asarray(dq), 0.0)
        assert np.allclose(np.asarray(dk), 0.0)
        assert np.allclose(np.asarray(dv), 0.0)

    @pytest.mark.slow
    def test_ring_fused_backward_matches_einsum_under_mesh(self):
        """jax.grad through the FUSED ring (fwd hop kernel + fused bwd hop
        kernels, interpret mode) == grad through the einsum ring, 8-way cp
        mesh.  The travelling dk/dv accumulators must come home after n
        rotations with exactly the einsum VJP's values."""
        import functools
        from functools import partial

        from jax.sharding import Mesh, PartitionSpec as P

        from kfunca_tpu.ops.pallas_kernels import ring_hop
        from kfunca_tpu.parallel.ring_attention import ring_attention_spmd

        orig_f = ring_hop.flash_attention_hop
        orig_b = ring_hop.flash_attention_bwd_hop
        ring_hop.flash_attention_hop = functools.partial(orig_f, interpret=True)
        ring_hop.flash_attention_bwd_hop = functools.partial(orig_b, interpret=True)
        try:
            mesh = Mesh(np.asarray(jax.devices()), ("cp",))
            spec = P(None, None, "cp", None)
            b, h, s, d = 1, 2, 8 * 128, 128
            key = jax.random.PRNGKey(2)
            q, k, v = (
                jax.random.normal(kk, (b, h, s, d), jnp.float32)
                for kk in jax.random.split(key, 3)
            )
            fns = {}
            for uk in (False, True):
                fns[uk] = jax.shard_map(
                    partial(ring_attention_spmd, axis="cp", use_kernel=uk),
                    mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
                    axis_names=frozenset({"cp"}), check_vma=False,
                )

            def loss(f):
                return lambda q, k, v: jnp.sum(jnp.sin(f(q, k, v)))

            with mesh:
                gref = jax.grad(loss(fns[False]), argnums=(0, 1, 2))(q, k, v)
                ggot = jax.grad(loss(fns[True]), argnums=(0, 1, 2))(q, k, v)
            for name, a, r in zip("dq dk dv".split(), ggot, gref):
                md = np.abs(np.asarray(a) - np.asarray(r)).max()
                assert md < 2e-5, (name, md)
        finally:
            ring_hop.flash_attention_hop = orig_f
            ring_hop.flash_attention_bwd_hop = orig_b
