"""int8 quantized GEMM: 2x-MXU-rate matmul for quantized serving/training.

Capability extension past the reference (its GEMM is fp32/fp64 CUTLASS
only): the v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate
(394 TFLOP/s roofline), which is the production serving configuration for
weight-quantized models.

Scheme: symmetric per-channel int8.
  * weights: per-OUTPUT-column scales, quantized offline (quantize_cols);
  * activations: per-ROW dynamic absmax scales computed on the fly;
  * the int32 accumulator dequantizes with a rank-1 scale outer product —
    fused into the kernel epilogue (one multiply per output element in the
    final k-step, no extra HBM pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels.common import pad_to, pick_block, round_up


def quantize_cols(w):
    """(k, n) float -> (int8 (k, n), fp32 scales (n,)): symmetric per-column."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_rows(a):
    """(m, k) float -> (int8 (m, k), fp32 scales (m,)): symmetric per-row."""
    absmax = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=1)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(
        jnp.round(a.astype(jnp.float32) / scale[:, None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_vecs(x):
    """float (..., d) -> (int8 (..., d), fp32 scales (...)): symmetric
    absmax over the trailing axis.  The KV-cache quantizer: one scale per
    stored (token, kv-head) vector (models/serve.py quantize_kv)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def _q8_kernel(a_ref, b_ref, sa_ref, sb_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        # dequant epilogue: rank-1 scale outer product on the final k-step
        sa = sa_ref[:][:, 0:1]  # (bm, 1) from lane-replicated block
        sb = sb_ref[0:1, :]  # (1, bn)
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * sa * sb).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "interpret"))
def matmul_q8(a_q8, b_q8, a_scale, b_scale, out_dtype=jnp.bfloat16, bm=512, bn=512, bk=4096, interpret=False):
    """int8 (m,k) @ int8 (k,n) with i32 accumulation and fused per-row x
    per-column dequantization: out[i,j] = acc[i,j] * a_scale[i] * b_scale[j].

    Measured on v5e 4096^3 (round-3 interleaved medians; chains feed the
    output back ELEMENTWISE — earlier harnesses consumed out[0,0] or a
    max-reduce and understated both arms, see bench.py bench_int8_gemm):
    this kernel holds ~329 TFLOP/s; XLA's int8 dot + fused rank-1 dequant
    epilogue reaches ~372 TFLOP/s = 94% of the 394 2x roofline (the bare
    XLA int8 dot probes 369-373 at every shape, tools_q8ceiling.py).
    matmul_q8_auto therefore dispatches XLA by default and keeps this
    kernel as the KFUNCA_GEMM_ENGINE=pallas substrate (same split as the
    bf16 GEMM, ops/gemm.py)."""
    m, k = a_q8.shape
    k2, n = b_q8.shape
    assert k == k2, (a_q8.shape, b_q8.shape)

    bm = pick_block(m, bm)
    bn = pick_block(n, bn)
    bk = pick_block(k, bk, align=128)
    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
    a_q8 = pad_to(a_q8, (mp, kp))
    b_q8 = pad_to(b_q8, (kp, np_))
    # row scales travel lane-replicated (mp, 128); col scales as (8, np_)
    sa = pad_to(
        jnp.broadcast_to(a_scale.astype(jnp.float32)[:, None], (m, 128)), (mp, 128)
    )
    sb = pad_to(
        jnp.broadcast_to(b_scale.astype(jnp.float32)[None, :], (8, n)), (8, np_)
    )

    grid = (mp // bm, np_ // bn, kp // bk)
    out = pl.pallas_call(
        _q8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            # constants must be explicit int32: a bare 0 under jax_enable_x64
            # becomes i64 and Mosaic fails to legalize func.return
            pl.BlockSpec((bm, 128), lambda i, j, kk: (i, _np.int32(0))),
            pl.BlockSpec((8, bn), lambda i, j, kk: (_np.int32(0), j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_q8, b_q8, sa, sb)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


def gemm_w8(a, w_q8, w_scale, out_dtype=None):
    """Weight-quantized GEMM: float activations (m,k) @ int8 weights (k,n).

    Activations are dynamically quantized per row (absmax), the matmul runs
    on the int8 MXU path, and dequantization is fused into the epilogue.
    End-to-end error vs the float matmul is bounded by the two int8
    roundings (~1% relative for well-scaled inputs).  Dispatches through
    matmul_q8_auto (XLA int8 dot by default — also the right choice for
    skinny decode activations, where the Pallas kernel's MXU tiles would
    be mostly padding)."""
    out_dtype = out_dtype or a.dtype
    a_q8, a_scale = quantize_rows(a)
    return matmul_q8_auto(a_q8, w_q8, a_scale, w_scale, out_dtype=out_dtype)


def matmul_q8_xla(a_q8, b_q8, a_scale, b_scale, out_dtype=jnp.bfloat16):
    """XLA's native int8 dot with the rank-1 dequant fused by the compiler.
    Exact i32 accumulation, same contract as matmul_q8."""
    acc = jax.lax.dot_general(
        a_q8, b_q8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (
        acc.astype(jnp.float32)
        * a_scale.astype(jnp.float32)[:, None]
        * b_scale.astype(jnp.float32)[None, :]
    ).astype(out_dtype)


def matmul_q8_auto(a_q8, b_q8, a_scale, b_scale, out_dtype=jnp.bfloat16, **kw):
    """Dispatched int8 GEMM.  Default engine is XLA's dot (measured ~372
    TFLOP/s on v5e 4096^3 vs ~329 for the Pallas kernel with elementwise-
    feed chains — the same vendor-path-wins split as bf16 gemm);
    KFUNCA_GEMM_ENGINE=pallas routes
    to matmul_q8 with per-chip autotuned blocks (runtime/autotune.py),
    explicit kwargs winning."""
    import os

    if os.environ.get("KFUNCA_GEMM_ENGINE", "xla") == "pallas" or kw:
        from ..runtime.autotune import lookup, shape_bucket

        m, k = a_q8.shape
        n = b_q8.shape[1]
        tuned = lookup("gemm_q8", shape_bucket(m, k, n), "int8") or {}
        tuned.update(kw)
        return matmul_q8(a_q8, b_q8, a_scale, b_scale, out_dtype=out_dtype, **tuned)
    return matmul_q8_xla(a_q8, b_q8, a_scale, b_scale, out_dtype=out_dtype)


# -----------------------------------------------------------------------------
# int4 weights (w4a8): group-wise quantization for 2x weight capacity over int8
# -----------------------------------------------------------------------------


def quantize_cols_int4(w, group: int = 128):
    """(k, n) float -> (int4 (k, n), fp32 scales (k/group, n)).

    Symmetric GROUP-WISE quantization along k (the GPTQ/AWQ convention):
    int4's 15-level range needs finer scale granularity than int8's
    per-column scales — one scale per (group of `group` k-rows, column)
    bounds the quantization error to the group's local dynamic range.
    int4 halves resident weight HBM vs int8 (quarters it vs bf16)."""
    k, n = w.shape
    if k % group:
        raise ValueError(f"k={k} not divisible by group={group}")
    wf = w.astype(jnp.float32).reshape(k // group, group, n)
    absmax = jnp.max(jnp.abs(wf), axis=1)  # (k/group, n)
    scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -7, 7)
    return q.reshape(k, n).astype(jnp.int4), scale


def matmul_w4_xla(a_q8, w_q4, a_scale, w_scale, out_dtype=jnp.bfloat16):
    """int8 activations (m, k) @ int4 weights (k, n) with group scales.

    The int4 weights upcast to int8 on the MXU's int8 path; accumulation is
    exact int32 WITHIN each k-group (the per-group partials then dequant and
    sum in fp32 — numerically STRONGER than one global int32 sum, since each
    group's scale is applied before the cross-group addition).  Expressed as
    one batched dot_general over the group axis so XLA keeps it on the MXU."""
    m, k = a_q8.shape
    g, n = w_scale.shape
    group = k // g
    ag = a_q8.reshape(m, g, group).transpose(1, 0, 2)          # (g, m, group)
    wg = w_q4.astype(jnp.int8).reshape(g, group, n)            # (g, group, n)
    # batched over g: (g, m, n) int32 exact per-group accumulators
    acc = jax.lax.dot_general(
        ag, wg, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )
    out = jnp.einsum(
        "gmn,gn->mn", acc.astype(jnp.float32), w_scale.astype(jnp.float32)
    )
    return (out * a_scale.astype(jnp.float32)[:, None]).astype(out_dtype)


def gemm_w4(a, w_q4, w_scale, out_dtype=None):
    """Weight-only int4 GEMM: float activations (m,k) @ int4 weights (k,n).

    w4a8: activations dynamically quantize per row to int8, weights upcast
    int4->int8 inside the batched MXU dot (no bf16 dequant matrix is ever
    materialized).  The decode regime this serves is weight-HBM-bound, so
    the int4 stream (half of int8, quarter of bf16) is the win; group-wise
    scales keep accuracy (quantize_cols_int4)."""
    out_dtype = out_dtype or a.dtype
    a_q8, a_scale = quantize_rows(a)
    return matmul_w4_xla(a_q8, w_q4, a_scale, w_scale, out_dtype=out_dtype)


def dequant_weight(w_q, scale, dtype=jnp.float32):
    """Quantized weight pair -> dense float weight.

    (int8 (k, n), (n,) col scales) or (int4 (k, n), (k/group, n) group
    scales) — the storage formats of quantize_cols / quantize_cols_int4.
    Used by the QLoRA training forward (models/lora.py): the base weight
    lives in HBM quantized and dequantizes transiently per matmul, which
    keeps the dot DIFFERENTIABLE w.r.t. activations (the w8a8 decode path
    quantizes activations with a round() that kills gradients — fine for
    inference, wrong for training)."""
    if scale.ndim == 1:  # int8 per-column
        return w_q.astype(dtype) * scale.astype(dtype)
    k, n = w_q.shape
    g = scale.shape[0]
    wf = w_q.astype(dtype).reshape(g, k // g, n) * scale.astype(dtype)[:, None, :]
    return wf.reshape(k, n)
