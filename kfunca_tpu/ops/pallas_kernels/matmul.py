"""MXU-tiled Pallas matmul with fp32 accumulation.

Replaces the reference's CUTLASS GEMM (gemm_kernel.cu, launcher_cuda.h:537-614)
and its dormant WMMA block_gemm_asic path.  TPU-first design:

  * grid (m/bm, n/bn, k/bk) with k innermost: TPU grids execute sequentially
    per core, so the fp32 VMEM accumulator persists across the k-steps of one
    (i, j) tile — no atomics/semaphores needed (contrast the reference's
    global-reduce staging).
  * blocks sized so A/B tiles + accumulator fit VMEM with double-buffered
    HBM->VMEM streaming handled by the pallas pipeline.
  * inputs are zero-padded to tile multiples on the host for ragged shapes;
    zero padding is exact for matmul and the result is sliced back.  The
    benchmark shapes (128-multiples) take the no-copy path.

fp32 / bf16 / fp16 storage, always fp32 MXU accumulation
(preferred_element_type), matching the reference's acc-type contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import pad_to, pick_block, round_up


def _apply_epilogue(acc, epilogue, bias_ref, res_ref):
    """Fused epilogue on the fp32 VMEM accumulator, applied once at the
    final k-step (the analog of the reference's CUTLASS alpha/beta epilogue,
    launcher_cuda.h:539-614, except fused ACTIVATIONS the reference never
    had).  Runs in fp32 before the output downcast — bias+act on the
    accumulator costs one VPU pass against tiles already resident in VMEM,
    where the XLA spelling materializes the matmul result first."""
    if bias_ref is not None:
        acc = acc + bias_ref[0].astype(jnp.float32)[None, :]
    if "gelu" in epilogue:
        acc = jax.nn.gelu(acc, approximate=True)
    elif "silu" in epilogue:
        acc = acc * jax.nn.sigmoid(acc)
    elif "relu" in epilogue:
        acc = jnp.maximum(acc, 0.0)
    if res_ref is not None:
        acc = acc + res_ref[:].astype(jnp.float32)
    return acc


def _matmul_kernel(a_ref, b_ref, *refs, epilogue=""):
    # operand layout: a, b, [bias], [residual], out, acc-scratch
    nin = ("bias" in epilogue) + ("res" in epilogue)
    bias_ref = refs[0] if "bias" in epilogue else None
    res_ref = refs[nin - 1] if "res" in epilogue else None
    o_ref, acc_ref = refs[nin], refs[nin + 1]

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fp32 inputs demand full fp32 MXU passes (bf16x6); the MXU default of
    # single-bf16-pass would give ~1e-2 relative error, breaking the
    # reference's fp32 GEMM contract (CUTLASS computes true fp32).
    # int8 inputs take the MXU's 2x-rate int8 path with exact i32 acc.
    prec = jax.lax.Precision.HIGHEST if a_ref.dtype == jnp.float32 else None
    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=acc_ref.dtype, precision=prec
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        acc = acc_ref[:]
        if epilogue:
            acc = _apply_epilogue(acc, epilogue, bias_ref, res_ref)
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bm", "bn", "bk", "vmem_limit", "epilogue",
                     "interpret"),
)
def matmul(a, b, bias=None, residual=None, out_dtype=None, bm=2048, bn=512,
           bk=2048, vmem_limit=100 * 1024 * 1024, epilogue="", interpret=False):
    """(m, k) @ (k, n) -> (m, n) with fp32 accumulation on the MXU.

    Default blocks (2048, 512, 2048) confirmed by INTERLEAVED A/B on TPU v5e
    (tools_gemmbench.py; sequential sweeps drift +-10% run to run and are
    not trusted): 179-185 TFLOP/s on 4096^3 bf16 vs 172-175 for the best
    alternative (1024, 1024, 4096); XLA's dot measures 181-200 in the same
    harness, which is why it stays the dispatch default (ops/gemm.py).
    pick_block shrinks blocks for small problems.

    `epilogue` fuses elementwise tails into the final k-step on the fp32
    accumulator (the reference's CUTLASS alpha/beta epilogue analog,
    launcher_cuda.h:539-614, extended with activations): any combination of
    "bias" (adds `bias`, shape (n,)), one of "gelu"/"silu"/"relu", and
    "res" (adds `residual`, shape (m, n)), applied in that order — e.g.
    epilogue="bias_gelu", epilogue="silu", epilogue="bias_res"."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    assert ("bias" in epilogue) == (bias is not None), (epilogue, bias is None)
    assert ("res" in epilogue) == (residual is not None), epilogue
    # int8 x int8 accumulates (and defaults to returning) exact int32
    default_out = jnp.int32 if jnp.issubdtype(jnp.dtype(a.dtype), jnp.integer) else a.dtype
    out_dtype = out_dtype or default_out

    bm = pick_block(m, bm)
    bn = pick_block(n, bn)
    bk = pick_block(k, bk, align=128)
    mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
    a = pad_to(a, (mp, kp))
    b = pad_to(b, (kp, np_))

    is_int = jnp.issubdtype(jnp.dtype(a.dtype), jnp.integer)
    acc_dt = jnp.int32 if is_int else jnp.float32
    grid = (mp // bm, np_ // bn, kp // bk)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
    ]
    operands = [a, b]
    if bias is not None:
        assert bias.shape == (n,), bias.shape
        # (1, bn) row block, index constant in k: fetched once per (i, j)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)))
        operands.append(pad_to(bias.reshape(1, n), (1, np_)))
    if residual is not None:
        assert residual.shape == (m, n), residual.shape
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)))
        operands.append(pad_to(residual, (mp, np_)))
    out = pl.pallas_call(
        functools.partial(_matmul_kernel, epilogue=epilogue),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_) * a.dtype.itemsize + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out
