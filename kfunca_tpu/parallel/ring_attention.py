"""Ring attention: context-parallel causal attention over a mesh axis.

Green-field capability — SURVEY.md §5 notes the reference's only
long-context mechanism is single-chip KV-tile streaming, and that scale-out
would be "shard_map + ppermute ring over ICI — no reference analog exists".
This is that ring:

  * the sequence is sharded over the `cp` axis: every device holds Q/K/V
    shards of S_local = S / cp tokens;
  * K/V shards rotate around the ring with `jax.lax.ppermute` (neighbor ICI
    transfers) while each device accumulates its Q shard's attention with
    the same online-softmax m/l merge the flash kernel uses — after cp hops
    every Q row has seen every K/V row, with O(S_local) memory per device;
  * causality uses GLOBAL positions, so the result is bit-comparable to
    single-device causal attention over the gathered sequence;
  * everything is differentiable (ppermute + scan transpose cleanly), so
    jax.grad gives the backward ring for free.

The blockwise math mirrors ops/pallas_kernels/flash_attention.py.  On real
TPU each hop runs FUSED as a Pallas kernel (ops/pallas_kernels/ring_hop.py:
flash tile with global-offset masking, m/l carried lane-replicated between
hops); the XLA einsum path below is the oracle and the CPU/mesh-test tier,
and interpret-mode tests pin the two paths to each other.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as _np
from jax.sharding import PartitionSpec as P

NEG_INF = _np.float32(-1e30)


def _block_attend(q, k, v, q_off, kv_off, m, l, acc, scale):
    """One online-softmax accumulation of q against a (k, v) block.

    q: (B,H,Sq,D) fp32; k/v: (B,H,Sk,D) fp32; m/l: (B,H,Sq,1); acc like q.
    q_off/kv_off are the blocks' global sequence offsets (traced scalars).
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    sq, sk = q.shape[2], k.shape[2]
    row = q_off + jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
    col = kv_off + jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
    s = jnp.where(col <= row, s, NEG_INF)

    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    p = jnp.where(col <= row, p, _np.float32(0.0))
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32
    )
    return m_new, l_new, acc_new


def _ring_fused(q, k, v, axis: str, want_lse: bool = False):
    """Fused-hop forward: each hop is the Pallas flash tile (ring_hop.py).

    want_lse=True additionally returns the padded lane-replicated natural
    lse (B*H, Sqp, 128) — the residual the fused backward ring consumes."""
    from ..ops.pallas_kernels.ring_hop import (
        flash_attention_hop,
        hop_carry_init,
        hop_finalize,
        hop_lse,
    )

    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    s_local = q.shape[2]
    scale = _np.float32(1.0 / math.sqrt(q.shape[-1]))
    perm = [(i, (i + 1) % n) for i in range(n)]

    b, h, _, d = q.shape
    qs = q * jnp.asarray(scale, q.dtype)  # scale folded into q once
    m, l, acc = hop_carry_init(b, h, s_local, d)

    def hop(carry, i):
        k_cur, v_cur, m, l, acc = carry
        src = (idx - i) % n
        m, l, acc = flash_attention_hop(
            qs, k_cur, v_cur, m, l, acc,
            (idx * s_local).astype(jnp.int32),
            (src * s_local).astype(jnp.int32),
        )
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return (k_nxt, v_nxt, m, l, acc), None

    (k, v, m, l, acc), _ = jax.lax.scan(hop, (k, v, m, l, acc), jnp.arange(n))
    out = hop_finalize(l, acc, b, h, s_local, d, q.dtype)
    if want_lse:
        return out, hop_lse(m, l)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ring_fused_diff(q, k, v, axis):
    return _ring_fused(q, k, v, axis)


def _ring_fused_fwd(q, k, v, axis):
    out, lse = _ring_fused(q, k, v, axis, want_lse=True)
    return out, (q, k, v, out, lse)


def _ring_fused_bwd(axis, res, g):
    """Fused backward ring (round 3): dk/dv accumulators TRAVEL the ring
    with their k/v shards (after n hops they are home), dq accumulates
    resident; each hop is one Pallas kernel (ring_hop.py: _bwd_hop_kernel)
    recomputing p from the saved global lse — FlashAttention-2 style, so
    hops are independent and nothing materializes an (Sq, Skv) score matrix
    outside VMEM tiles."""
    from ..ops.pallas_kernels.ring_hop import (
        bwd_carry_init,
        flash_attention_bwd_hop,
        lane_replicate_rows,
    )

    q, k, v, out, lse = res
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    b, h, s_local, d = q.shape
    scale = _np.float32(1.0 / math.sqrt(d))
    perm = [(i, (i + 1) % n) for i in range(n)]

    qs = q * jnp.asarray(scale, q.dtype)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    sqp = lse.shape[1]
    deltaf = lane_replicate_rows(delta, b, h, s_local, sqp)
    dq0, dk0, dv0 = bwd_carry_init(b, h, s_local, s_local, d)

    def hop(carry, i):
        k_cur, v_cur, dk_cur, dv_cur, dq_acc = carry
        src = (idx - i) % n
        dq_acc, dk_cur, dv_cur = flash_attention_bwd_hop(
            qs, k_cur, v_cur, g, lse, deltaf, dq_acc, dk_cur, dv_cur,
            (idx * s_local).astype(jnp.int32),
            (src * s_local).astype(jnp.int32),
        )
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        dk_nxt = jax.lax.ppermute(dk_cur, axis, perm)
        dv_nxt = jax.lax.ppermute(dv_cur, axis, perm)
        return (k_nxt, v_nxt, dk_nxt, dv_nxt, dq_acc), None

    (k_fin, v_fin, dk_acc, dv_acc, dq_acc), _ = jax.lax.scan(
        hop, (k, v, dk0, dv0, dq0), jnp.arange(n)
    )
    # after n rotations dk/dv are back at their owners
    dq = (dq_acc[:, :s_local, :d] * scale).reshape(b, h, s_local, d).astype(q.dtype)
    dk = dk_acc[:, :s_local, :d].reshape(b, h, s_local, d).astype(k.dtype)
    dv = dv_acc[:, :s_local, :d].reshape(b, h, s_local, d).astype(v.dtype)
    return dq, dk, dv


_ring_fused_diff.defvjp(_ring_fused_fwd, _ring_fused_bwd)


def ring_attention_spmd(q, k, v, *, axis: str = "cp", use_kernel: bool | None = None):
    """Runs INSIDE shard_map over `axis`; q/k/v: local (B,H,S_local,D).

    use_kernel=True runs each hop as the fused Pallas flash tile
    (ring_hop.py; backward takes the einsum path's VJP); None auto-selects
    the kernel on real TPU for fp32/bf16."""
    if use_kernel is None:
        from ..runtime.backend import use_pallas

        use_kernel = use_pallas() and q.dtype in (jnp.float32, jnp.bfloat16)
    if use_kernel:
        return _ring_fused_diff(q, k, v, axis)
    return _ring_einsum(q, k, v, axis)


def _ring_einsum(q, k, v, axis: str):
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    s_local = q.shape[2]
    scale = _np.float32(1.0 / math.sqrt(q.shape[-1]))
    perm = [(i, (i + 1) % n) for i in range(n)]

    qf = q.astype(jnp.float32)
    m = jnp.full(q.shape[:3] + (1,), NEG_INF, jnp.float32)
    l = jnp.zeros_like(m)
    acc = jnp.zeros_like(qf)

    def hop(carry, i):
        k_cur, v_cur, m, l, acc = carry
        src = (idx - i) % n  # whose shard we hold at hop i
        m, l, acc = _block_attend(
            qf,
            k_cur.astype(jnp.float32),
            v_cur.astype(jnp.float32),
            idx * s_local,
            src * s_local,
            m,
            l,
            acc,
            scale,
        )
        # rotate shards to the next neighbor (ICI hop)
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return (k_nxt, v_nxt, m, l, acc), None

    (k, v, m, l, acc), _ = jax.lax.scan(hop, (k, v, m, l, acc), jnp.arange(n))
    l_safe = jnp.where(l == 0.0, _np.float32(1.0), l)
    return (acc / l_safe).astype(q.dtype)


def make_ring_attention(mesh, *, cp_axis: str = "cp"):
    """Returns fn(q, k, v) with (B, H, S, D) GLOBAL shapes, sequence sharded
    over `cp_axis`; other mesh axes stay GSPMD-auto."""
    spec = P(None, None, cp_axis, None)
    return jax.shard_map(
        partial(ring_attention_spmd, axis=cp_axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        axis_names=frozenset({cp_axis}),
        check_vma=False,
    )
