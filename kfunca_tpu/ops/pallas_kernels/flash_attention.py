"""Flash causal attention, forward AND backward, as Pallas TPU kernels.

Forward rebuilds the reference's blockwise online-softmax kernel
(/root/reference/src/device/utils/causal_attention.h:113-207) TPU-first:
the CUDA version tiles KV by 32 through shared memory with warp reductions;
here a LIVE-ONLY grid of (q, kv) tile pairs streams KV blocks through VMEM
with the m/l carry in VMEM scratch (the grid runs sequentially per core, so
the carry needs no cross-block synchronization).  Per-row logsumexp is
written out — the statistic the reference stores "for a future backward"
(causal_attention.h:191-206) — and the backward actually exists here as ONE
fused FlashAttention-2-style kernel (recompute p per tile from saved lse;
dq in a whole-sequence VMEM accumulator, dk/dv in per-row scratch).

Performance structure (measured on TPU v5e, b4 h16 s2048 d128 bf16 causal;
round-3 sweeps in tools_attn3.py / tools_attnbwd.py):

  * LIVE-ONLY grid — scalar-prefetched (iq, ik, flags) step tables
    enumerate only blocks on or below the causal diagonal, so causal
    skipping costs zero dead grid steps.  512^2 tiles + live grid measure
    81 TFLOP/s fwd vs 78.9 for a single 2048^2 tile (which computes the
    full dense matrix) and 15.2 for jax's stock pallas flash kernel;
  * exp2 softmax — scale*log2(e) folds into the q prescale, making every
    per-element transcendental the VPU-native exp2; the backward converts
    lse into the exp2 domain and restores ln2/scale in the tiny
    (rows, 128)-wide flush multiplies;
  * ONE unconditional compute path — masking every live block is FASTER
    than branching: a scalar lax.cond skipping the mask on fully-below-
    diagonal blocks measured ~35% slower (Mosaic materializes the vector-
    valued branch), and a masked/unmasked pl.when split that conditionally
    consumed operand refs measured ~2x slower (defeats DMA pipelining);
  * the MXU/VPU SERIALIZE on this chip (matmuls stream through the vector
    datapath): an independent-MXU-vs-VPU microbenchmark (tools_overlap.py)
    measures T(both) = T(mxu) + T(vpu), so per-step softmax VPU passes are
    pure additive cost — the kernels minimize passes (fused mask+exp2,
    lane-replicated (rows, 128) statistics, bf16 second-dot feeds);
  * native-dtype MXU feeds — bf16 operands hit the MXU in one pass (p/ds
    cast back to bf16 for the second dot); fp32 uses HIGHEST (3-pass);
  * o is rescaled ONCE at the last kv step of each row, where lse is also
    written (0, not -inf, for padding rows: the backward exponentiates it).

Contract (matches reference + torch sdpa is_causal):
  scale = 1/sqrt(D); top-left-aligned causal mask (row i attends col j <= i);
  arbitrary B, H, Sq, Skv, D via zero-padding + masking (no naive fallback).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import assert_vmem_fits, pad_to, pick_block, round_up

import numpy as _np

NEG_INF = _np.float32(-1e30)  # finite f32 mask value: NaN-free exp on masked rows
_ONE = _np.float32(1.0)
_ZERO = _np.float32(0.0)

def _prec(hi_prec: bool):
    # fp32 storage demands full-precision MXU passes; bf16 storage uses the
    # native single pass (see matmul.py for the rationale).
    return jax.lax.Precision.HIGHEST if hi_prec else None


def _mxu_in(x, hi_prec: bool, dt):
    """Second-dot operand: bf16 feeds the MXU natively; fp32 keeps f32."""
    return x if hi_prec else x.astype(dt)


def _causal_mask(s, iq, ik, bq, bk, skv, window=None):
    """Top-left-aligned causal mask; `window` adds Mistral-style sliding-
    window attention (row attends cols in (row-window, row])."""
    row = iq * _np.int32(bq) + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col = ik * _np.int32(bk) + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    ok = (col <= row) & (col < _np.int32(skv))
    if window is not None:
        ok = ok & (col > row - _np.int32(window))
    return jnp.where(ok, s, NEG_INF)


def _lanes(x128, n):
    """Replicate a lane-replicated (rows, 128) vector to (rows, n).

    An explicit vreg tile: Mosaic handles this far better than broadcasting
    a (rows, 1) slice across lanes (the (rows, 1) carry layout measured ~2x
    slower per step at 512^2 tiles)."""
    return x128 if n == 128 else jnp.tile(x128, (1, n // 128))


# ----------------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------------


F_ROW_FIRST = 1  # first live kv block of a q row: init m/l/acc
F_ROW_LAST = 2   # last kv block of a q row: rescale + store o (and lse)

LOG2E = _np.float32(math.log2(math.e))
LN2 = _np.float32(math.log(2.0))


def _tables_native(kind: str, nqb, nkb, bq, bk):
    """Step tables from the native core (kf_{fwd,bwd}_live_tables); None
    when the library is unavailable (KFUNCA_NO_NATIVE or build failure)."""
    from ...runtime._native import get_lib

    lib = get_lib()
    if lib is None:
        return None
    import ctypes

    fn = lib.kf_fwd_live_tables if kind == "fwd" else lib.kf_bwd_live_tables
    n = int(fn(nqb, nkb, bq, bk, None, None, None))
    iqs = _np.empty(n, _np.int32)
    iks = _np.empty(n, _np.int32)
    fls = _np.empty(n, _np.int32)
    p = ctypes.POINTER(ctypes.c_int32)
    fn(nqb, nkb, bq, bk, iqs.ctypes.data_as(p), iks.ctypes.data_as(p),
       fls.ctypes.data_as(p))
    return iqs, iks, fls


def _fwd_tables(nqb, nkb, bq, bk, window=None):
    """(iq, ik, flags) per LIVE step, q-major with kv streamed inner.
    Blocks above the causal diagonal never enter the grid (the round-2
    kernel cycled them as prefetch-only dead steps; the live-only grid
    measured faster and is what makes causal skipping pay at all).

    `window` (sliding-window attention) additionally drops blocks entirely
    BELOW each row's window — long-context sliding attention then costs
    O(S * window) regardless of S.

    Generated natively (csrc kf_fwd_live_tables) when the core is loaded —
    long-context shapes enumerate tens of thousands of steps and this runs
    at trace time; the Python loop below is the parity-tested fallback
    (and the only path for window != None)."""
    if window is None:
        native = _tables_native("fwd", nqb, nkb, bq, bk)
        if native is not None:
            return native
    iqs, iks, fls = [], [], []
    for i in range(nqb):
        last_k = min((i * bq + bq - 1) // bk, nkb - 1)
        first_k = 0
        if window is not None:
            # the block's FIRST row attends cols > i*bq - window
            first_k = max(0, (i * bq - window + 1) // bk)
        for j in range(first_k, last_k + 1):
            iqs.append(i)
            iks.append(j)
            fls.append((F_ROW_FIRST if j == first_k else 0)
                       | (F_ROW_LAST if j == last_k else 0))
    return (_np.asarray(iqs, _np.int32), _np.asarray(iks, _np.int32),
            _np.asarray(fls, _np.int32))


def _fwd_kernel(iq_t, ik_t, fl_t, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_ref, l_ref, acc_ref, *, skv, bq, bk, hi_prec, window=None,
                raw_stats=False):
    # lse_ref is None in the inference-only variant (no residual output)
    t = pl.program_id(1)
    iq = iq_t[t]
    ik = ik_t[t]
    flags = fl_t[t]

    @pl.when((flags & F_ROW_FIRST) != 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    prec = _prec(hi_prec)
    in_dt = q_ref.dtype

    q = q_ref[0] if not hi_prec else q_ref[0].astype(jnp.float32)
    k = k_ref[0] if not hi_prec else k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # mask applied unconditionally: a scalar lax.cond that skips it on
    # fully-below-diagonal blocks measured ~35% SLOWER (Mosaic materializes
    # the vector-valued branch), sweeps r3
    s = _causal_mask(s, iq, ik, bq, bk, skv, window)
    # softmax state stays lane-replicated (bq, 128): full-vreg VPU ops.
    # exp2 domain: scale*log2(e) is folded into the q prescale, so the
    # per-element transcendental is the VPU-native exp2
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1)[:, None])
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - _lanes(m_new, s.shape[1]))
    l_new = l_ref[:] * alpha + jnp.sum(p, axis=1)[:, None]
    v = v_ref[0] if not hi_prec else v_ref[0].astype(jnp.float32)
    acc_ref[:] = acc_ref[:] * _lanes(alpha, acc_ref.shape[1]) + jax.lax.dot(
        _mxu_in(p, hi_prec, in_dt), v,
        preferred_element_type=jnp.float32, precision=prec,
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when((flags & F_ROW_LAST) != 0)
    def _store():
        l_safe = jnp.where(l_new == _ZERO, _ONE, l_new)
        o_ref[0] = (acc_ref[:] / _lanes(l_safe, acc_ref.shape[1])).astype(o_ref.dtype)
        if lse_ref is not None:
            # lane-replicated lse; rows that saw no valid column (sequence
            # padding) get 0, NOT -inf — the backward computes
            # exp2(s - lse) and an -inf lse would blow those rows up to
            # inf * 0 = NaN.  raw_stats keeps the exp2 domain the backward
            # consumes directly (skipping the LN2/LOG2E round trip and the
            # XLA re-broadcast); the public lse is natural-log
            raw = m_new + jnp.log2(l_safe)
            lse_ref[0] = jnp.where(
                l_new == _ZERO,
                _ZERO,
                raw if raw_stats else raw * LN2,
            )


# Forward tile defaults, swept on v5e (b4 h16 s2048 d128 bf16, interleaved
# 5-round medians, tools_attn3.py sweeps 1-4): the 512^2 LIVE-grid kernel
# measures 81.0 TFLOP/s vs 78.9 for the round-2 single-2048^2-tile kernel
# and 15.2 for jax's stock pallas flash kernel on the same shape.  Smaller
# tiles lose to per-step overhead (256^2: 40.9), larger ones to causal
# waste (1024^2: 75.7; the old 2048^2 computes the full dense matrix).
BQ_DEFAULT = 512
BK_DEFAULT = 512


def _kv_head_map(h: int, hkv: int):
    """bh (q-head grid coord) -> kv-head coordinate for GQA: q head hq
    reads kv head hq // (h // hkv).  Identity when hkv == h."""
    if hkv == h:
        return lambda bh: bh
    group = h // hkv
    i32 = _np.int32
    return lambda bh: (bh // i32(h)) * i32(hkv) + (bh % i32(h)) // i32(group)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "save_stats", "window",
                                              "raw_stats", "interpret"))
def flash_attention_fwd_stats(q, k, v, bq=BQ_DEFAULT, bk=BK_DEFAULT, save_stats=True,
                              window=None, raw_stats=False, interpret=False):
    """Returns (out, lse) with out: (B,H,Sq,D), lse: (B,H,Sq) fp32 natural
    log (lse is None when save_stats=False — the inference path skips the
    residual write entirely).

    raw_stats=True instead returns lse as the kernel's own residual layout:
    (B*H, Sq_padded, 128) fp32, lane-replicated, exp2 domain — exactly what
    flash_attention_backward(stats128=...) consumes, skipping the
    slice -> re-broadcast -> LN2/LOG2E round trip through HBM that the
    public layout costs when fwd and bwd compose.

    GQA: k/v may carry FEWER heads than q (H % H_kv == 0); each group of
    H/H_kv query heads reads one kv head — expressed purely through the kv
    BlockSpec index maps, zero extra compute or HBM.  `window` enables
    sliding-window attention: blocks outside each row's window never enter
    the live grid, so cost is O(S * window).

    On HBM the per-row statistics travel lane-replicated as (BH, Sq, 128);
    the public return value slices lane 0.
    """
    b, h, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    assert h % hkv == 0, (h, hkv)
    scale = (1.0 / math.sqrt(d)) * float(LOG2E)  # exp2-domain prescale

    bq = pick_block(sq, bq)
    bk = pick_block(skv, bk)
    sqp, skvp, dp = round_up(sq, bq), round_up(skv, bk), round_up(d, 128)
    nqb, nkb = sqp // bq, skvp // bk

    qs = (q * jnp.asarray(scale, q.dtype)).reshape(b * h, sq, d)
    qf = pad_to(qs, (b * h, sqp, dp))
    kf = pad_to(k.reshape(b * hkv, skv, d), (b * hkv, skvp, dp))
    vf = pad_to(v.reshape(b * hkv, skv, d), (b * hkv, skvp, dp))

    iq_t, ik_t, fl_t = _fwd_tables(nqb, nkb, bq, bk, window)
    i32 = _np.int32
    kvh = _kv_head_map(h, hkv)

    kernel = _fwd_kernel
    if not save_stats:
        def kernel(iq_t, ik_t, fl_t, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, **kw):
            return _fwd_kernel(
                iq_t, ik_t, fl_t, q_ref, k_ref, v_ref, o_ref, None,
                m_ref, l_ref, acc_ref, **kw
            )
    kernel = functools.partial(
        kernel, skv=skv, bq=bq, bk=bk, hi_prec=q.dtype == jnp.float32, window=window,
        raw_stats=raw_stats,
    )
    out_specs = [pl.BlockSpec((1, bq, dp), lambda bh, t, iqt, ikt, flt: (bh, iqt[t], i32(0)))]
    out_shapes = [jax.ShapeDtypeStruct((b * h, sqp, dp), q.dtype)]
    if save_stats:
        out_specs.append(
            pl.BlockSpec((1, bq, 128), lambda bh, t, iqt, ikt, flt: (bh, iqt[t], i32(0)))
        )
        out_shapes.append(jax.ShapeDtypeStruct((b * h, sqp, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * h, len(iq_t)),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, t, iqt, ikt, flt: (bh, iqt[t], i32(0))),
            pl.BlockSpec((1, bk, dp), lambda bh, t, iqt, ikt, flt: (kvh(bh), ikt[t], i32(0))),
            pl.BlockSpec((1, bk, dp), lambda bh, t, iqt, ikt, flt: (kvh(bh), ikt[t], i32(0))),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # m
            pltpu.VMEM((bq, 128), jnp.float32),  # l
            pltpu.VMEM((bq, dp), jnp.float32),  # acc
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * sqp * skvp * dp,  # ~causal half of dense 4x
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * sqp * skvp // 2,
        ),
        interpret=interpret,
    )(iq_t, ik_t, fl_t, qf, kf, vf)
    out = res[0][:, :sq, :d].reshape(b, h, sq, d)
    if not save_stats:
        return out, None
    if raw_stats:
        return out, res[1]  # (b*h, sqp, 128) exp2-domain, padded
    lse = res[1][:, :sq, 0].reshape(b, h, sq)
    return out, lse


def flash_attention_forward(q, k, v, interpret=False, **blocks):
    return flash_attention_fwd_stats(
        q, k, v, save_stats=False, interpret=interpret, **blocks
    )[0]


# ----------------------------------------------------------------------------
# backward (FlashAttention-2 style; new work — the reference has no backward)
# ----------------------------------------------------------------------------


# The backward is ONE fused kernel (round 3; round 2 ran separate dkv + dq
# kernels, recomputing s and dp in each — 7 matmul-units per live block pair
# vs the 5 a fused pass needs; measured 21% faster end-to-end fwd+bwd on v5e
# at (512, 512) blocks, tools_attnbwd.py, DCE-proofed chains):
#
#   * grid (bh, t) over LIVE (ik, iq) pairs only — scalar-prefetched step
#     tables (kv-major, q inner); blocks above the causal diagonal never
#     enter the grid;
#   * dk/dv accumulate in (bk, dp) VMEM scratch, flushed at each kv row end;
#   * dq accumulates in a WHOLE-SEQUENCE (sqp, dp) fp32 VMEM scratch (1 MB
#     at s=2048 d=128), zeroed per bh, flushed once at bh end — revisited
#     HBM output blocks (whose flush/prefetch DMA ordering is undefined)
#     are avoided entirely;
#   * exp2 softmax: q pre-scaled by scale*log2(e), lse consumed in the
#     exp2 domain; dk absorbs ln(2) and dq absorbs `scale` in their cheap
#     (rows, 128)-wide flush multiplies, so the (bq, bk)-wide ds tile is
#     never rescaled;
#   * row statistics are produced in-kernel (session-3 rework, measured
#     +9.6% fwd+bwd vs the XLA-prep structure, tools_attnfuse.py
#     interleaved: 2.588 vs 2.836 ms at 1024^2 tiles): delta=rowsum(g*o)
#     is computed on each q block's FIRST visit and cached in a whole-
#     sequence VMEM scratch (no separate XLA pass, no (Sq,128) HBM
#     materialization), lse arrives as the forward's own raw exp2-domain
#     lane-replicated residual (raw_stats=True) with no re-broadcast, and
#     both ride FROZEN index maps so their DMAs fire nqb times per bh
#     instead of every step.

F_BH_FIRST = 4   # first step of this bh: zero the dq acc
F_BH_LAST = 8    # last step of this bh: flush dq
F_FIRST_VISIT = 16  # first step touching this q block: cache lse, compute delta


def _bwd_tables(nqb, nkb, bq, bk, window=None):
    """(iq, ik, flags) per live step, kv-major with q streamed inner.

    first_q is CLAMPED so every kv block gets at least one step: a kv block
    entirely beyond the last q block (ragged skv > sq) computes one fully-
    masked step that flushes exact-zero dk/dv — skipping it would leave the
    output block unwritten (uninitialized HBM).

    Generated natively (csrc kf_bwd_live_tables) when the core is loaded;
    the Python loop is the parity-tested fallback (and the only path for
    window != None, which also DROPS q blocks beyond the kv block's
    window)."""
    if window is None:
        native = _tables_native("bwd", nqb, nkb, bq, bk)
        if native is not None:
            return native
    steps = []
    for jk in range(nkb):
        first_q = min((jk * bk) // bq, nqb - 1)
        last_q = nqb - 1
        if window is not None:
            # cols in this kv block are read by rows < jk*bk + bk + window - 1
            last_q = min(nqb - 1, (jk * bk + bk - 1 + window - 1) // bq)
        for i in range(first_q, last_q + 1):
            steps.append((jk, i, first_q, last_q))
    iqs, iks, fls = [], [], []
    for t, (jk, i, first_q, last_q) in enumerate(steps):
        fl = 0
        if i == first_q:
            fl |= F_ROW_FIRST
        if i == last_q:
            fl |= F_ROW_LAST
        if t == 0:
            fl |= F_BH_FIRST
        if t == len(steps) - 1:
            fl |= F_BH_LAST
        iqs.append(i)
        iks.append(jk)
        fls.append(fl)
    return (_np.asarray(iqs, _np.int32), _np.asarray(iks, _np.int32),
            _np.asarray(fls, _np.int32))


def _fused_bwd_kernel(iq_t, ik_t, fl_t, ov_t, q_ref, k_ref, v_ref, g_ref,
                      o_ref, lse_ref, dq_ref, dk_ref, dv_ref,
                      dq_acc, dk_acc, dv_acc, lse_c, delta_c,
                      *, scale, skv, bq, bk, hi_prec, window=None):
    t = pl.program_id(1)
    iq = iq_t[t]
    ik = ik_t[t]
    flags = fl_t[t]

    @pl.when((flags & F_BH_FIRST) != 0)
    def _init_dq():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when((flags & F_ROW_FIRST) != 0)
    def _init_dkv():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    prec = _prec(hi_prec)
    in_dt = q_ref.dtype

    def fp(x):
        return x.astype(jnp.float32) if hi_prec else x

    q = fp(q_ref[0])
    k = fp(k_ref[0])
    v = fp(v_ref[0])
    g = fp(g_ref[0])

    # Row statistics are produced IN-KERNEL on each q block's first visit
    # and cached in whole-sequence VMEM scratch: delta = rowsum(g*o) never
    # runs as a separate XLA pass, and neither stat is re-broadcast through
    # HBM or re-DMA'd per step (o/lse ride FROZEN index maps: their blocks
    # only move on first-visit steps).
    @pl.when((flags & F_FIRST_VISIT) != 0)
    def _cache_stats():
        lse_c[pl.ds(iq * bq, bq), :] = lse_ref[0]
        d_row = jnp.sum(
            g_ref[0].astype(jnp.float32) * o_ref[0].astype(jnp.float32), axis=1
        )[:, None]
        delta_c[pl.ds(iq * bq, bq), :] = jnp.broadcast_to(d_row, (bq, 128))

    lse = lse_c[pl.ds(iq * bq, bq), :]      # (bq, 128) lane-replicated, exp2
    delta = delta_c[pl.ds(iq * bq, bq), :]  # (bq, 128) lane-replicated

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    s = _causal_mask(s, iq, ik, bq, bk, skv, window)
    # masked entries underflow to exact 0 (lse is finite for every real row;
    # padded q rows have lse == 0 from the forward and only ever multiply
    # zero g/delta)
    p = jnp.exp2(s - _lanes(lse, s.shape[1]))

    # dv += p^T g
    dv_acc[:] += jax.lax.dot_general(
        _mxu_in(p, hi_prec, in_dt), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # dp = g v^T ; ds = p * (dp - delta)   (natural-domain ds)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    ds = _mxu_in(p * (dp - _lanes(delta, dp.shape[1])), hi_prec, in_dt)
    # dk += ds^T q_pass  (q carries scale*log2e; the flush multiplies by ln2)
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # dq rows of this iq += ds k  (the flush multiplies by `scale`)
    upd = jax.lax.dot(ds, k, preferred_element_type=jnp.float32, precision=prec)
    dq_acc[pl.ds(iq * bq, bq), :] += upd

    @pl.when((flags & F_ROW_LAST) != 0)
    def _flush_dkv():
        dk_ref[0] = (dk_acc[:] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    @pl.when((flags & F_BH_LAST) != 0)
    def _flush_dq():
        dq_ref[0] = (dq_acc[:] * _np.float32(scale)).astype(dq_ref.dtype)


# backward tile defaults (fallback when the autotune cache has no entry —
# production consults runtime/autotune.py per shape).  Post in-kernel-stats
# rework sweep (tools_attnbwd2.py, interleaved, DCE-proofed, v5e): s=2048
# wants (512, 1024) — 2.6-2.7 ms = 89-93 TFLOP/s steady-state (the sweep's
# 2.45 ms reading was cross-process drift, docs/ATTENTION_CEILING.md §r4),
# vs 92.7 at 512^2 and 89.9 at 1024^2 in the same sweep session — and
# s=8192 wants 1024^2 (133.8 TFLOP/s reconciled, vs 121 at 512^2);
# both shipped in autotune_defaults.json.  512^2 stays the static fallback
# (never worse than 2nd by >4% at any swept shape).
BQ_BWD_DEFAULT = 512
BK_BWD_DEFAULT = 512


def _first_visit_tables(iq_t, ik_t, fl_t):
    """Mark each q block's FIRST step (F_FIRST_VISIT) and build the frozen
    o/lse block-index table: the index only moves on first-visit steps, so
    Mosaic re-DMAs those operands nqb times per bh instead of every step."""
    ov = _np.empty_like(iq_t)
    fl = fl_t.copy()
    seen = set()
    last = 0
    for t in range(len(iq_t)):
        i = int(iq_t[t])
        if i not in seen:
            seen.add(i)
            fl[t] |= F_FIRST_VISIT
            last = i
        ov[t] = last
    return ov, fl


@functools.partial(jax.jit, static_argnames=("bq", "bk", "window", "interpret"))
def flash_attention_backward(q, k, v, g, out=None, lse=None, stats128=None,
                             bq=BQ_BWD_DEFAULT, bk=BK_BWD_DEFAULT, window=None,
                             interpret=False):
    """Fused dq/dk/dv in one kernel pass.  `lse` is the natural-log per-row
    logsumexp from flash_attention_fwd_stats; `stats128` is the raw
    (B*H, Sq_padded, 128) exp2-domain residual from
    flash_attention_fwd_stats(raw_stats=True), which skips the HBM
    re-broadcast entirely.  Both absent -> the forward is recomputed here.
    delta (rowsum(g*out)) is computed INSIDE the kernel on each q block's
    first visit and cached in VMEM — no separate XLA pass, no (Sq, 128)
    materialization.

    GQA (k/v with fewer heads): the kernel emits PER-Q-HEAD dk/dv partials
    (the kv index maps read the shared head); the wrapper group-sums them
    to kv-head shape — one cheap XLA reduction instead of cross-grid
    accumulation races."""
    b, h, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    assert h % hkv == 0, (h, hkv)
    scale = 1.0 / math.sqrt(d)

    bq = pick_block(sq, bq)
    bk = pick_block(skv, bk)
    sqp, skvp, dp = round_up(sq, bq), round_up(skv, bk), round_up(d, 128)
    nqb, nkb = sqp // bq, skvp // bk
    # Sequence-bounded VMEM guard (common.py rails): this kernel keeps dq,
    # lse, and delta resident for the WHOLE padded sequence, plus the
    # per-step operand blocks — cap S before Mosaic fails opaquely.
    assert_vmem_fits(
        sqp * (dp + 256) * 4 + (bk * dp * 2 * 4)  # seq scratch + dk/dv acc
        + (3 * bq * dp + 2 * bk * dp + bq * 128) * q.dtype.itemsize * 2,
        f"flash_attention_backward (sq={sq}, d={d}, bq={bq}, bk={bk})",
    )
    if out is None or (lse is None and stats128 is None):
        out, stats128 = flash_attention_fwd_stats(
            q, k, v, window=window, raw_stats=True, interpret=interpret
        )

    qs = (q * jnp.asarray(scale * float(LOG2E), q.dtype)).reshape(b * h, sq, d)
    qf = pad_to(qs, (b * h, sqp, dp))
    kf = pad_to(k.reshape(b * hkv, skv, d), (b * hkv, skvp, dp))
    vf = pad_to(v.reshape(b * hkv, skv, d), (b * hkv, skvp, dp))
    gf = pad_to(g.reshape(b * h, sq, d), (b * h, sqp, dp))
    of = pad_to(out.reshape(b * h, sq, d), (b * h, sqp, dp))
    if stats128 is not None:
        lsef = stats128
        if lsef.shape[1] != sqp:  # forward ran with a different bq
            lsef = pad_to(lsef[:, :sq], (b * h, sqp, 128))
    else:
        # compat path: lane-replicate the natural-log lse into exp2 domain
        lsef = pad_to(
            jnp.broadcast_to(
                (lse * LOG2E).astype(jnp.float32).reshape(b * h, sq, 1),
                (b * h, sq, 128),
            ),
            (b * h, sqp, 128),
        )

    iq_t, ik_t, fl_t = _bwd_tables(nqb, nkb, bq, bk, window)
    ov_t, fl_t = _first_visit_tables(iq_t, ik_t, fl_t)
    i32 = _np.int32
    kvh = _kv_head_map(h, hkv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b * h, len(iq_t)),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, t, iqt, ikt, flt, ovt: (bh, iqt[t], i32(0))),
            pl.BlockSpec((1, bk, dp), lambda bh, t, iqt, ikt, flt, ovt: (kvh(bh), ikt[t], i32(0))),
            pl.BlockSpec((1, bk, dp), lambda bh, t, iqt, ikt, flt, ovt: (kvh(bh), ikt[t], i32(0))),
            pl.BlockSpec((1, bq, dp), lambda bh, t, iqt, ikt, flt, ovt: (bh, iqt[t], i32(0))),
            # o and lse ride the FROZEN table: DMA only on first-visit steps
            pl.BlockSpec((1, bq, dp), lambda bh, t, iqt, ikt, flt, ovt: (bh, ovt[t], i32(0))),
            pl.BlockSpec((1, bq, 128), lambda bh, t, iqt, ikt, flt, ovt: (bh, ovt[t], i32(0))),
        ],
        out_specs=[
            pl.BlockSpec((1, sqp, dp), lambda bh, t, iqt, ikt, flt, ovt: (bh, i32(0), i32(0))),
            pl.BlockSpec((1, bk, dp), lambda bh, t, iqt, ikt, flt, ovt: (bh, ikt[t], i32(0))),
            pl.BlockSpec((1, bk, dp), lambda bh, t, iqt, ikt, flt, ovt: (bh, ikt[t], i32(0))),
        ],
        scratch_shapes=[
            pltpu.VMEM((sqp, dp), jnp.float32),  # dq acc (whole sequence)
            pltpu.VMEM((bk, dp), jnp.float32),   # dk acc
            pltpu.VMEM((bk, dp), jnp.float32),   # dv acc
            pltpu.VMEM((sqp, 128), jnp.float32),  # lse cache (whole sequence)
            pltpu.VMEM((sqp, 128), jnp.float32),  # delta cache (whole sequence)
        ],
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, scale=scale, skv=skv, bq=bq, bk=bk,
            hi_prec=q.dtype == jnp.float32, window=window,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sqp, dp), q.dtype),
            # GQA: per-q-head partials stay fp32 so the group-sum does not
            # round per term
            jax.ShapeDtypeStruct((b * h, skvp, dp), jnp.float32 if hkv != h else k.dtype),
            jax.ShapeDtypeStruct((b * h, skvp, dp), jnp.float32 if hkv != h else v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * sqp * skvp * dp,  # 5 dots, ~causal half of dense
            bytes_accessed=(qf.size * 2 + kf.size * 2 + vf.size * 2) * q.dtype.itemsize,
            transcendentals=b * h * sqp * skvp // 2,
        ),
        interpret=interpret,
    )(iq_t, ik_t, fl_t, ov_t, qf, kf, vf, gf, of, lsef)

    dq = dq[:, :sq, :d].reshape(b, h, sq, d)
    dk = dk[:, :skv, :d].reshape(b, h, skv, d)
    dv = dv[:, :skv, :d].reshape(b, h, skv, d)
    if hkv != h:
        group = h // hkv
        dk = dk.reshape(b, hkv, group, skv, d).sum(axis=2).astype(k.dtype)
        dv = dv.reshape(b, hkv, group, skv, d).sum(axis=2).astype(v.dtype)
    return dq, dk, dv
