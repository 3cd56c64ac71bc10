"""Flash causal attention, forward AND backward, as Pallas TPU kernels.

Forward rebuilds the reference's blockwise online-softmax kernel
(/root/reference/src/device/utils/causal_attention.h:113-207) TPU-first:
the CUDA version tiles KV by 32 through shared memory with warp reductions;
here the q-tile grid streams KV blocks through VMEM with the m/l carry kept
in VMEM scratch (the grid's innermost dimension runs sequentially per core,
so the carry needs no cross-block synchronization).  Per-row logsumexp is
written out — the statistic the reference stores "for a future backward"
(causal_attention.h:191-206) — and the backward actually exists here
(FlashAttention-2 style: recompute p per tile from saved lse, kv-parallel
dk/dv kernel + q-parallel dq kernel).

Performance structure (measured on TPU v5e, b4 h16 s2048 d128 bf16 causal):

  * causal block skipping — steps whose block lies entirely on the dead
    side of the diagonal skip compute (pl.when) and their BlockSpec index
    maps PREFETCH the next live block (kv index 0 for the next q row in
    fwd/dq; the first live q block in dkv), so dead steps cost neither HBM
    traffic nor a pipeline bubble at the row transition;
  * ONE unconditional compute path per kernel — a masked/unmasked branch
    split was measured 2x SLOWER at 512^2 tiles: conditional consumption
    of the operand refs defeats Mosaic's DMA/compute software pipelining.
    Fully-masked rows need no select after exp: the first live block of
    every row contains valid columns (col 0), so the m-carry is always
    real before a masked-out row can appear, and exp(NEG_INF - m) == 0;
  * scale folding — q is pre-multiplied by 1/sqrt(D) outside the kernel
    (backward folds the factor into ds for dq, and dk absorbs it from the
    pre-scaled q);
  * native-dtype MXU feeds — bf16 operands hit the MXU in one pass (p/ds
    cast back to bf16 for the second dot); fp32 uses HIGHEST (3-pass);
  * o is rescaled ONCE at the last kv step (final division) instead of
    per step, and lse is written only there.

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

from .common import pad_to, pick_block, round_up

import numpy as _np

NEG_INF = _np.float32(-1e30)  # finite f32 mask value: NaN-free exp on masked rows
_ONE = _np.float32(1.0)
_ZERO = _np.float32(0.0)

# Tile defaults (swept on v5e, b4 h16 s2048 d128 bf16; see BENCH details).
# Large square tiles win on this part: per-grid-step overhead outweighs the
# causal-skip savings of small tiles (512^2 measured 1.2-2.3x slower than a
# single 2048^2 tile across sweeps, despite skipping 6/16 blocks; run-to-run
# variance through the relay is large, but the ordering was stable).  At
# longer sequences the 2048^2 tile grid still skips above-diagonal blocks.
BQ_DEFAULT = 2048
BK_DEFAULT = 2048


def _prec(hi_prec: bool):
    # fp32 storage demands full-precision MXU passes; bf16 storage uses the
    # native single pass (see matmul.py for the rationale).
    return jax.lax.Precision.HIGHEST if hi_prec else None


def _mxu_in(x, hi_prec: bool, dt):
    """Second-dot operand: bf16 feeds the MXU natively; fp32 keeps f32."""
    return x if hi_prec else x.astype(dt)


def _causal_mask(s, iq, ik, bq, bk, skv):
    row = iq * _np.int32(bq) + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col = ik * _np.int32(bk) + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    return jnp.where((col <= row) & (col < _np.int32(skv)), s, NEG_INF)


def _lanes(x128, n):
    """Replicate a lane-replicated (rows, 128) vector to (rows, n).

    An explicit vreg tile: Mosaic handles this far better than broadcasting
    a (rows, 1) slice across lanes (the (rows, 1) carry layout measured ~2x
    slower per step at 512^2 tiles)."""
    return x128 if n == 128 else jnp.tile(x128, (1, n // 128))


# ----------------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *, skv, bq, bk, hi_prec):
    # lse_ref is None in the inference-only variant (no residual output)
    iq = pl.program_id(1)
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    prec = _prec(hi_prec)
    in_dt = q_ref.dtype

    # causal: this kv block contributes iff its first col <= q block's last row
    @pl.when(ik * bk <= iq * bq + bq - 1)
    def _compute():
        q = q_ref[0] if not hi_prec else q_ref[0].astype(jnp.float32)
        k = k_ref[0] if not hi_prec else k_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        s = _causal_mask(s, iq, ik, bq, bk, skv)
        # all softmax state stays lane-replicated (bq, 128): every op below
        # is a native full-vreg VPU op (see _lanes)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1)[:, None])
        alpha = jnp.exp(m_prev - m_new)
        # masked entries underflow to exact 0: the first live block of every
        # row holds valid cols, so m_new is never NEG_INF-degenerate here
        p = jnp.exp(s - _lanes(m_new, s.shape[1]))
        l_new = l_ref[:] * alpha + jnp.sum(p, axis=1)[:, None]
        v = v_ref[0] if not hi_prec else v_ref[0].astype(jnp.float32)
        dp_dim = acc_ref.shape[1]
        acc_ref[:] = acc_ref[:] * _lanes(alpha, dp_dim) + jax.lax.dot(
            _mxu_in(p, hi_prec, in_dt), v,
            preferred_element_type=jnp.float32, precision=prec,
        )
        m_ref[:] = m_new
        l_ref[:] = l_new

    @pl.when(ik == pl.num_programs(2) - 1)
    def _store():
        l_safe = jnp.where(l_ref[:] == _ZERO, _ONE, l_ref[:])
        o_ref[0] = (acc_ref[:] / _lanes(l_safe, acc_ref.shape[1])).astype(o_ref.dtype)
        if lse_ref is not None:
            # lse kept lane-replicated (bq, 128) — no sublane<->lane transpose
            lse_ref[0] = m_ref[:] + jnp.log(l_safe)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "save_stats", "interpret"))
def flash_attention_fwd_stats(q, k, v, bq=BQ_DEFAULT, bk=BK_DEFAULT, save_stats=True, interpret=False):
    """Returns (out, lse) with out: (B,H,Sq,D), lse: (B,H,Sq) fp32
    (lse is None when save_stats=False — the inference path skips the
    residual write entirely).

    On HBM the per-row statistics travel lane-replicated as (BH, Sq, 128);
    the public return value slices lane 0.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / math.sqrt(d)

    bq = pick_block(sq, bq)
    bk = pick_block(skv, bk)
    sqp, skvp, dp = round_up(sq, bq), round_up(skv, bk), round_up(d, 128)

    # scale folded into q once (saves a bq*bk multiply every kv step)
    qs = (q * jnp.asarray(scale, q.dtype)).reshape(b * h, sq, d)
    qf = pad_to(qs, (b * h, sqp, dp))
    kf = pad_to(k.reshape(b * h, skv, d), (b * h, skvp, dp))
    vf = pad_to(v.reshape(b * h, skv, d), (b * h, skvp, dp))

    # dead steps (block above the diagonal) prefetch kv block 0: it is the
    # first block the NEXT q row needs, so the row transition has no bubble
    def kv_idx(bh, i, j):
        live = j * _np.int32(bk) <= i * _np.int32(bq) + _np.int32(bq - 1)
        return (bh, jax.lax.select(live, j, _np.int32(0)), _np.int32(0))

    grid = (b * h, sqp // bq, skvp // bk)
    kernel = _fwd_kernel
    if not save_stats:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, **kw):
            return _fwd_kernel(q_ref, k_ref, v_ref, o_ref, None, m_ref, l_ref, acc_ref, **kw)
    kernel = functools.partial(
        kernel, skv=skv, bq=bq, bk=bk, hi_prec=q.dtype == jnp.float32
    )
    out_specs = [pl.BlockSpec((1, bq, dp), lambda bh, i, j: (bh, i, _np.int32(0)))]
    out_shapes = [jax.ShapeDtypeStruct((b * h, sqp, dp), q.dtype)]
    if save_stats:
        out_specs.append(pl.BlockSpec((1, bq, 128), lambda bh, i, j: (bh, i, _np.int32(0))))
        out_shapes.append(jax.ShapeDtypeStruct((b * h, sqp, 128), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, i, j: (bh, i, _np.int32(0))),
            pl.BlockSpec((1, bk, dp), kv_idx),
            pl.BlockSpec((1, bk, dp), kv_idx),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # m
            pltpu.VMEM((bq, 128), jnp.float32),  # l
            pltpu.VMEM((bq, dp), jnp.float32),  # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * sqp * skvp * dp,  # ~causal half of dense 4x
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * sqp * skvp // 2,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = res[0][:, :sq, :d].reshape(b, h, sq, d)
    if not save_stats:
        return out, None
    lse = res[1][:, :sq, 0].reshape(b, h, sq)
    return out, lse


def flash_attention_forward(q, k, v, interpret=False):
    return flash_attention_fwd_stats(q, k, v, save_stats=False, interpret=interpret)[0]


# ----------------------------------------------------------------------------
# backward (FlashAttention-2 style; new work — the reference has no backward)
# ----------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, skv, bq, bk, hi_prec
):
    """dk/dv for one kv block, streaming q blocks.  q is pre-scaled by
    1/sqrt(D): dk = ds_unscaled^T @ q_scaled reproduces the scale exactly."""
    ik = pl.program_id(1)
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    prec = _prec(hi_prec)
    in_dt = q_ref.dtype

    # q block contributes iff its last row >= kv block's first col
    @pl.when(iq * bq + bq - 1 >= ik * bk)
    def _compute():
        q = q_ref[0] if not hi_prec else q_ref[0].astype(jnp.float32)
        k = k_ref[0] if not hi_prec else k_ref[0].astype(jnp.float32)
        v = v_ref[0] if not hi_prec else v_ref[0].astype(jnp.float32)
        g = g_ref[0] if not hi_prec else g_ref[0].astype(jnp.float32)
        lse = lse_ref[0]  # (bq, 128) lane-replicated
        delta = delta_ref[0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        s = _causal_mask(s, iq, ik, bq, bk, skv)
        p = jnp.exp(s - _lanes(lse, s.shape[1]))  # masked entries underflow to 0

        # dv += p^T g
        dv_acc[:] += jax.lax.dot_general(
            _mxu_in(p, hi_prec, in_dt), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        # ds = p * (dp - delta),  dp = g v^T   (scale lives in pre-scaled q)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        ds = p * (dp - _lanes(delta, dp.shape[1]))
        # dk += ds^T q_scaled
        dk_acc[:] += jax.lax.dot_general(
            _mxu_in(ds, hi_prec, in_dt), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    @pl.when(iq == pl.num_programs(2) - 1)
    def _store():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, dq_acc, *, scale, skv, bq, bk, hi_prec):
    iq = pl.program_id(1)
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    prec = _prec(hi_prec)
    in_dt = q_ref.dtype

    @pl.when(ik * bk <= iq * bq + bq - 1)
    def _compute():
        q = q_ref[0] if not hi_prec else q_ref[0].astype(jnp.float32)
        k = k_ref[0] if not hi_prec else k_ref[0].astype(jnp.float32)
        v = v_ref[0] if not hi_prec else v_ref[0].astype(jnp.float32)
        g = g_ref[0] if not hi_prec else g_ref[0].astype(jnp.float32)
        lse = lse_ref[0]  # (bq, 128) lane-replicated
        delta = delta_ref[0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        s = _causal_mask(s, iq, ik, bq, bk, skv)
        p = jnp.exp(s - _lanes(lse, s.shape[1]))
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        # dq (wrt unscaled q) = scale * ds @ k
        ds = p * (dp - _lanes(delta, dp.shape[1])) * _np.float32(scale)
        dq_acc[:] += jax.lax.dot(
            _mxu_in(ds, hi_prec, in_dt), k,
            preferred_element_type=jnp.float32, precision=prec,
        )

    @pl.when(ik == pl.num_programs(2) - 1)
    def _store():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "interpret"))
def flash_attention_backward(q, k, v, g, out=None, lse=None, bq=BQ_DEFAULT, bk=BK_DEFAULT, interpret=False):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    if out is None or lse is None:
        out, lse = flash_attention_fwd_stats(q, k, v, interpret=interpret)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (b,h,sq)

    bq = pick_block(sq, bq)
    bk = pick_block(skv, bk)
    sqp, skvp, dp = round_up(sq, bq), round_up(skv, bk), round_up(d, 128)
    nqb, nkb = sqp // bq, skvp // bk

    qs = (q * jnp.asarray(scale, q.dtype)).reshape(b * h, sq, d)
    qf = pad_to(qs, (b * h, sqp, dp))
    kf = pad_to(k.reshape(b * h, skv, d), (b * h, skvp, dp))
    vf = pad_to(v.reshape(b * h, skv, d), (b * h, skvp, dp))
    gf = pad_to(g.reshape(b * h, sq, d), (b * h, sqp, dp))
    # lane-replicated row statistics (see flash_attention_fwd_stats)
    lsef = pad_to(
        jnp.broadcast_to(lse.reshape(b * h, sq, 1), (b * h, sq, 128)), (b * h, sqp, 128)
    )
    deltaf = pad_to(
        jnp.broadcast_to(delta.reshape(b * h, sq, 1), (b * h, sq, 128)), (b * h, sqp, 128)
    )

    # --- dk/dv: kv blocks parallel, q streamed.  Dead steps (q block above
    # the kv block's causal range) prefetch the first live q block.
    def q_idx_kv(bh, jk, i):
        first = jax.lax.div(jk * _np.int32(bk), _np.int32(bq))
        return (bh, jnp.maximum(i, first), _np.int32(0))

    q_spec_kv = pl.BlockSpec((1, bq, dp), q_idx_kv)
    kv_spec_kv = pl.BlockSpec((1, bk, dp), lambda bh, jk, i: (bh, jk, _np.int32(0)))
    row_spec_kv = pl.BlockSpec((1, bq, 128), q_idx_kv)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, skv=skv, bq=bq, bk=bk, hi_prec=q.dtype == jnp.float32),
        grid=(b * h, nkb, nqb),
        in_specs=[q_spec_kv, kv_spec_kv, kv_spec_kv, q_spec_kv, row_spec_kv, row_spec_kv],
        out_specs=[
            pl.BlockSpec((1, bk, dp), lambda bh, jk, i: (bh, jk, _np.int32(0))),
            pl.BlockSpec((1, bk, dp), lambda bh, jk, i: (bh, jk, _np.int32(0))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, skvp, dp), k.dtype),
            jax.ShapeDtypeStruct((b * h, skvp, dp), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dp), jnp.float32),
            pltpu.VMEM((bk, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, deltaf)

    # --- dq: q blocks parallel, kv streamed; dead steps prefetch kv block 0
    def kv_idx_q(bh, i, j):
        live = j * _np.int32(bk) <= i * _np.int32(bq) + _np.int32(bq - 1)
        return (bh, jax.lax.select(live, j, _np.int32(0)), _np.int32(0))

    q_spec_q = pl.BlockSpec((1, bq, dp), lambda bh, i, jk: (bh, i, _np.int32(0)))
    kv_spec_q = pl.BlockSpec((1, bk, dp), kv_idx_q)
    row_spec_q = pl.BlockSpec((1, bq, 128), lambda bh, i, jk: (bh, i, _np.int32(0)))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, skv=skv, bq=bq, bk=bk, hi_prec=q.dtype == jnp.float32),
        grid=(b * h, nqb, nkb),
        in_specs=[q_spec_q, kv_spec_q, kv_spec_q, q_spec_q, row_spec_q, row_spec_q],
        out_specs=pl.BlockSpec((1, bq, dp), lambda bh, i, jk: (bh, i, _np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, deltaf)

    dq = dq[:, :sq, :d].reshape(b, h, sq, d)
    dk = dk[:, :skv, :d].reshape(b, h, skv, d)
    dv = dv[:, :skv, :d].reshape(b, h, skv, d)
    return dq, dk, dv
