"""Fused per-hop kernel for ring attention.

Ring attention (parallel/ring_attention.py) rotates K/V shards around the
`cp` mesh axis and merges each hop with the online-softmax carry.  This
kernel fuses ONE hop — q-block grid, the hop's whole K/V shard resident in
VMEM, global-position causal masking from traced sequence offsets — so the
per-hop math runs as a flash tile instead of a materialized (Sq, Skv) score
matrix.  The m/l carry travels between hops lane-replicated as
(BH, Sq, 128) fp32 (the same convention as flash_attention.py's lse), and
the accumulator unnormalized (final division happens after the last hop).

Offsets are TRACED scalars (each device's hop offset depends on
lax.axis_index), delivered via PrefetchScalarGridSpec scalar operands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as _np

from .common import pad_to, pick_block, round_up
from .flash_attention import NEG_INF, _lanes, _mxu_in, _prec


def _hop_kernel(
    qoff_ref, kvoff_ref, q_ref, k_ref, v_ref, mi_ref, li_ref, acci_ref,
    mo_ref, lo_ref, acco_ref, *, bq, skv_valid, skvp, hi_prec
):
    iq = pl.program_id(1)
    prec = _prec(hi_prec)
    in_dt = q_ref.dtype

    q = q_ref[0] if not hi_prec else q_ref[0].astype(jnp.float32)
    k = k_ref[0] if not hi_prec else k_ref[0].astype(jnp.float32)
    v = v_ref[0] if not hi_prec else v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # global-position causal mask; kv padding masked via the VALID length
    row = qoff_ref[0] + iq * _np.int32(bq) + jax.lax.broadcasted_iota(
        jnp.int32, (bq, skvp), 0
    )
    col_local = jax.lax.broadcasted_iota(jnp.int32, (bq, skvp), 1)
    col = kvoff_ref[0] + col_local
    s = jnp.where((col <= row) & (col_local < _np.int32(skv_valid)), s, NEG_INF)

    m_prev = mi_ref[0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1)[:, None])
    alpha = jnp.exp(m_prev - m_new)
    # NB: unlike the self-contained forward, a hop may see NO valid column
    # for a row (its kv shard is entirely in the row's future); m_new stays
    # at the carry (or NEG_INF on the first hop), p underflows to zero, and
    # the where() below keeps exp(NEG_INF - NEG_INF) == 1 rows out.
    p = jnp.exp(s - _lanes(m_new, skvp))
    p = jnp.where(s == NEG_INF, _np.float32(0.0), p)
    lo_ref[0] = li_ref[0] * alpha + jnp.sum(p, axis=1)[:, None]
    acco_ref[0] = acci_ref[0] * _lanes(alpha, acci_ref.shape[-1]) + jax.lax.dot(
        _mxu_in(p, hi_prec, in_dt), v,
        preferred_element_type=jnp.float32, precision=prec,
    )
    mo_ref[0] = m_new


@functools.partial(jax.jit, static_argnames=("bq", "interpret"))
def flash_attention_hop(q, k, v, m, l, acc, q_off, kv_off, bq=2048, interpret=False):
    """One ring hop: merge q's attention over this hop's (k, v) shard into
    the (m, l, acc) carry.

    q: (B,H,Sq,D) PRE-SCALED by 1/sqrt(D); k/v: (B,H,Skv,D).
    m/l: (B*H, Sqp, 128) fp32 lane-replicated; acc: (B*H, Sqp, Dp) fp32
    (padded layouts — allocate with hop_carry_init).
    q_off/kv_off: traced int32 global offsets of the q and kv shards.
    Returns updated (m, l, acc).
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq = pick_block(sq, bq)
    sqp, dp = round_up(sq, bq), round_up(d, 128)
    skvp = round_up(skv, 128)

    qf = pad_to(q.reshape(b * h, sq, d), (b * h, sqp, dp))
    kf = pad_to(k.reshape(b * h, skv, d), (b * h, skvp, dp))
    vf = pad_to(v.reshape(b * h, skv, d), (b * h, skvp, dp))
    offs = jnp.asarray([q_off], jnp.int32), jnp.asarray([kv_off], jnp.int32)

    kernel = functools.partial(
        _hop_kernel, bq=bq, skv_valid=skv, skvp=skvp, hi_prec=q.dtype == jnp.float32
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * h, sqp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, i, qo, ko: (bh, i, 0)),
            pl.BlockSpec((1, skvp, dp), lambda bh, i, qo, ko: (bh, 0, 0)),
            pl.BlockSpec((1, skvp, dp), lambda bh, i, qo, ko: (bh, 0, 0)),
            pl.BlockSpec((1, bq, 128), lambda bh, i, qo, ko: (bh, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda bh, i, qo, ko: (bh, i, 0)),
            pl.BlockSpec((1, bq, dp), lambda bh, i, qo, ko: (bh, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, 128), lambda bh, i, qo, ko: (bh, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda bh, i, qo, ko: (bh, i, 0)),
            pl.BlockSpec((1, bq, dp), lambda bh, i, qo, ko: (bh, i, 0)),
        ],
    )
    m, l, acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(m.shape, jnp.float32),
            jax.ShapeDtypeStruct(l.shape, jnp.float32),
            jax.ShapeDtypeStruct(acc.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*offs, qf, kf, vf, m, l, acc)
    return m, l, acc


def hop_carry_init(b, h, sq, d, bq=2048):
    """Zero-initialized (m, l, acc) carry in the hop kernel's padded layout."""
    bq = pick_block(sq, bq)
    sqp, dp = round_up(sq, bq), round_up(d, 128)
    m = jnp.full((b * h, sqp, 128), NEG_INF, jnp.float32)
    l = jnp.zeros((b * h, sqp, 128), jnp.float32)
    acc = jnp.zeros((b * h, sqp, dp), jnp.float32)
    return m, l, acc


def hop_finalize(l, acc, b, h, sq, d, out_dtype):
    """acc / l (safe) sliced back to (B, H, Sq, D)."""
    l_safe = jnp.where(l == 0.0, _np.float32(1.0), l)
    out = acc / l_safe[..., :1]  # lane-replicated: lane 0 is the value
    return out[:, :sq, :d].reshape(b, h, sq, d).astype(out_dtype)


# ---------------------------------------------------------------------------
# backward hop (round 3): fused dq/dk/dv accumulation for one ring hop
# ---------------------------------------------------------------------------


def _bwd_hop_kernel(
    qoff_ref, kvoff_ref, q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
    dqi_ref, dki_ref, dvi_ref, dqo_ref, dko_ref, dvo_ref,
    *, bq, skv_valid, skvp, hi_prec
):
    """One hop's gradient contributions, FlashAttention-2 style: p is
    recomputed from the saved GLOBAL lse, so hops are independent (no m/l
    carry in the backward) and simply accumulate into the travelling dk/dv
    and the resident dq.  q arrives pre-scaled by 1/sqrt(D): dk absorbs the
    scale exactly (ds^T @ q_scaled); dq accumulates unscaled ds @ k and the
    ring wrapper multiplies by scale once at the end."""
    iq = pl.program_id(1)
    prec = _prec(hi_prec)
    in_dt = q_ref.dtype

    q = q_ref[0] if not hi_prec else q_ref[0].astype(jnp.float32)
    k = k_ref[0] if not hi_prec else k_ref[0].astype(jnp.float32)
    v = v_ref[0] if not hi_prec else v_ref[0].astype(jnp.float32)
    g = g_ref[0] if not hi_prec else g_ref[0].astype(jnp.float32)
    lse = lse_ref[0]      # (bq, 128) lane-replicated, natural log
    delta = delta_ref[0]  # (bq, 128) lane-replicated

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    row = qoff_ref[0] + iq * _np.int32(bq) + jax.lax.broadcasted_iota(
        jnp.int32, (bq, skvp), 0
    )
    col_local = jax.lax.broadcasted_iota(jnp.int32, (bq, skvp), 1)
    col = kvoff_ref[0] + col_local
    s = jnp.where((col <= row) & (col_local < _np.int32(skv_valid)), s, NEG_INF)
    # masked entries: exp(NEG_INF - finite lse) underflows to exact 0, so a
    # fully-future shard contributes nothing (the all-masked-hop contract)
    p = jnp.exp(s - _lanes(lse, skvp))

    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    ds = p * (dp - _lanes(delta, dp.shape[1]))

    # dq (resident): one visit per q block
    dqo_ref[0] = dqi_ref[0] + jax.lax.dot(
        _mxu_in(ds, hi_prec, in_dt), k,
        preferred_element_type=jnp.float32, precision=prec,
    )
    # dk/dv (travelling): accumulate across the q-block grid dimension
    dk_add = jax.lax.dot_general(
        _mxu_in(ds, hi_prec, in_dt), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dv_add = jax.lax.dot_general(
        _mxu_in(p, hi_prec, in_dt), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(iq == 0)
    def _first():
        dko_ref[0] = dki_ref[0] + dk_add
        dvo_ref[0] = dvi_ref[0] + dv_add

    @pl.when(iq > 0)
    def _rest():
        dko_ref[0] += dk_add
        dvo_ref[0] += dv_add


@functools.partial(jax.jit, static_argnames=("bq", "interpret"))
def flash_attention_bwd_hop(
    q, k, v, g, lse, delta, dq, dk, dv, q_off, kv_off, bq=2048, interpret=False
):
    """One backward ring hop.

    q: (B,H,Sq,D) PRE-SCALED by 1/sqrt(D); k/v: (B,H,Skv,D); g: (B,H,Sq,D).
    lse/delta: (B*H, Sqp, 128) fp32 lane-replicated (natural-log lse; delta
    = sum(g*out, -1)).  dq: (B*H, Sqp, Dp) fp32 resident accumulator
    (UNSCALED: multiply by 1/sqrt(D) after the last hop).  dk/dv:
    (B*H, Skvp, Dp) fp32 accumulators that travel the ring with k/v.
    Returns updated (dq, dk, dv).
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq = pick_block(sq, bq)
    sqp, dp = round_up(sq, bq), round_up(d, 128)
    skvp = round_up(skv, 128)

    qf = pad_to(q.reshape(b * h, sq, d), (b * h, sqp, dp))
    kf = pad_to(k.reshape(b * h, skv, d), (b * h, skvp, dp))
    vf = pad_to(v.reshape(b * h, skv, d), (b * h, skvp, dp))
    gf = pad_to(g.reshape(b * h, sq, d), (b * h, sqp, dp))
    offs = jnp.asarray([q_off], jnp.int32), jnp.asarray([kv_off], jnp.int32)

    kernel = functools.partial(
        _bwd_hop_kernel, bq=bq, skv_valid=skv, skvp=skvp, hi_prec=q.dtype == jnp.float32
    )
    i32 = _np.int32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * h, sqp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, i, qo, ko: (bh, i, i32(0))),
            pl.BlockSpec((1, skvp, dp), lambda bh, i, qo, ko: (bh, i32(0), i32(0))),
            pl.BlockSpec((1, skvp, dp), lambda bh, i, qo, ko: (bh, i32(0), i32(0))),
            pl.BlockSpec((1, bq, dp), lambda bh, i, qo, ko: (bh, i, i32(0))),
            pl.BlockSpec((1, bq, 128), lambda bh, i, qo, ko: (bh, i, i32(0))),
            pl.BlockSpec((1, bq, 128), lambda bh, i, qo, ko: (bh, i, i32(0))),
            pl.BlockSpec((1, bq, dp), lambda bh, i, qo, ko: (bh, i, i32(0))),
            pl.BlockSpec((1, skvp, dp), lambda bh, i, qo, ko: (bh, i32(0), i32(0))),
            pl.BlockSpec((1, skvp, dp), lambda bh, i, qo, ko: (bh, i32(0), i32(0))),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, i, qo, ko: (bh, i, i32(0))),
            pl.BlockSpec((1, skvp, dp), lambda bh, i, qo, ko: (bh, i32(0), i32(0))),
            pl.BlockSpec((1, skvp, dp), lambda bh, i, qo, ko: (bh, i32(0), i32(0))),
        ],
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(dq.shape, jnp.float32),
            jax.ShapeDtypeStruct(dk.shape, jnp.float32),
            jax.ShapeDtypeStruct(dv.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*offs, qf, kf, vf, gf, lse, delta, dq, dk, dv)
    return dq, dk, dv


def bwd_carry_init(b, h, sq, skv, d, bq=2048):
    """Zero (dq, dk, dv) accumulators in the bwd hop kernel's padded layout."""
    bq = pick_block(sq, bq)
    sqp, dp = round_up(sq, bq), round_up(d, 128)
    skvp = round_up(skv, 128)
    dq = jnp.zeros((b * h, sqp, dp), jnp.float32)
    dk = jnp.zeros((b * h, skvp, dp), jnp.float32)
    dv = jnp.zeros((b * h, skvp, dp), jnp.float32)
    return dq, dk, dv


def hop_lse(m, l):
    """Natural-log lse from the forward carry, lane-replicated padded.

    Rows that saw no valid column (sequence PADDING rows: m=NEG_INF, l=0)
    get lse=0, not NEG_INF: the backward computes exp(s - lse), and
    exp(s + 1e30) would blow up to inf*0=NaN on those rows — with lse=0
    their p is a harmless O(1) value that only ever multiplies zero
    gradients/deltas."""
    return jnp.where(l == 0.0, _np.float32(0.0), m + jnp.log(jnp.maximum(l, 1e-30)))


def lane_replicate_rows(x, b, h, sq, sqp):
    """(B,H,Sq) row statistic -> (B*H, Sqp, 128) lane-replicated fp32."""
    r = jnp.broadcast_to(
        x.reshape(b * h, sq, 1).astype(jnp.float32), (b * h, sq, 128)
    )
    return pad_to(r, (b * h, sqp, 128))
