"""Ring attention (context parallelism) vs single-device causal oracle."""

import math

import numpy as np

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
