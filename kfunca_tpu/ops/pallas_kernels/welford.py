"""Single-pass Welford statistics kernel: (R, C) -> (mean, invstd) over dim 0.

Rebuild of the reference's fused batch-norm statistics pass
(/root/reference/src/device/utils/welford_norm.h, norm_ops_kernel.cu:6-61).
The CUDA version needs per-thread Welford -> SLM vertical merge -> multi-block
staging buffers + semaphores.  On TPU the grid's row dimension is sequential
per core, so the entire reduction is a VMEM accumulator loop with the same
numerically-stable chunk merge (welford_merge, welford_norm.h:270-301) and no
synchronization at all.

Round-4 cost rework (the round-3 kernel measured 5.3 ms on 16387^2 vs the
1.31 ms HBM floor):

  * NO host pad: `pad_to` on a non-block-divisible input copied the whole
    1.07 GB array (~2.6 ms of pure HBM traffic).  The grid's ROW dimension
    now covers only the floor-aligned region (every row block fully valid)
    and the ragged tail rows are reduced in XLA (a few rows) and merged
    with the kernel's moments by the same Welford chunk formula.  The
    ragged COLUMN block reads partially out of bounds — Mosaic fills OOB
    lanes with garbage — but lanes are independent and those columns are
    sliced away from the output, so no masking is needed anywhere.
  * NO per-element mask: raw per-tile moments (sum, sum-of-squares; the
    round-3 kernel's iota+compare+multiply mask was pure VPU overhead).
    Within one tile cm2 = sq - s^2/br is bounded-cancellation; CROSS-tile
    accumulation stays on the stable Welford merge.

Contract: eps = 1e-12, invstd = 1/sqrt(m2/R + eps), fp32.
"""

from __future__ import annotations

import functools

import jax
import numpy as _np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import pick_block, round_up


def _welford_kernel(x_ref, mean_ref, m2_ref, mean_acc, m2_acc, *, br):
    ir = pl.program_id(1)

    @pl.when(ir == 0)
    def _init():
        mean_acc[:] = jnp.zeros_like(mean_acc)
        m2_acc[:] = jnp.zeros_like(m2_acc)

    x = x_ref[:].astype(jnp.float32)  # (br, bc), fully valid rows
    s = jnp.sum(x, axis=0, keepdims=True)       # (1, bc)
    sq = jnp.sum(x * x, axis=0, keepdims=True)  # (1, bc)
    inv_br = jnp.float32(1.0 / br)
    cmean = s * inv_br
    cm2 = jnp.maximum(sq - s * cmean, jnp.float32(0.0))

    # Welford chunk merge (reference welford_merge); counts are static per
    # step: n = ir*br rows seen, cn = br new rows.
    n = ir.astype(jnp.float32) * jnp.float32(br)
    tot = n + jnp.float32(br)
    delta = cmean - mean_acc[:]
    mean_acc[:] = mean_acc[:] + delta * (jnp.float32(br) / tot)
    m2_acc[:] = m2_acc[:] + cm2 + delta * delta * (n * jnp.float32(br) / tot)

    @pl.when(ir == pl.num_programs(1) - 1)
    def _store():
        mean_ref[:] = mean_acc[:]
        m2_ref[:] = m2_acc[:]


def _xla_moments(x):
    """(mean (1, C), m2 (1, C), count) of a (rows, C) slab in fp32."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=0, keepdims=True)
    m2 = jnp.sum((xf - m) * (xf - m), axis=0, keepdims=True)
    return m, m2, x.shape[0]


@functools.partial(jax.jit, static_argnames=("br", "bc", "interpret"))
def welford_norm_stat(x, br=512, bc=512, interpret=False):
    """x: (R, C) fp32 -> (mean (1, C), invstd (1, C))."""
    r, c = x.shape
    br = pick_block(r, br, align=8)
    bc = pick_block(c, bc)
    r_main = (r // br) * br

    if r_main == 0:  # too few rows for even one block: pure XLA
        mean, m2, _ = _xla_moments(x)
    else:
        cp = round_up(c, bc)  # grid extent only — x itself is NOT padded
        grid = (cp // bc, r_main // br)
        kernel = functools.partial(_welford_kernel, br=br)
        mean, m2 = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((br, bc), lambda j, i: (i, j))],
            out_specs=[
                pl.BlockSpec((1, bc), lambda j, i: (_np.int32(0), j)),
                pl.BlockSpec((1, bc), lambda j, i: (_np.int32(0), j)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, cp), jnp.float32),
                jax.ShapeDtypeStruct((1, cp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, bc), jnp.float32),  # running mean
                pltpu.VMEM((1, bc), jnp.float32),  # running m2
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(x)
        mean, m2 = mean[:, :c], m2[:, :c]
        if r_main < r:  # ragged tail rows: XLA moments + Welford merge
            tmean, tm2, tn = _xla_moments(x[r_main:, :])
            n = jnp.float32(r_main)
            cn = jnp.float32(tn)
            tot = n + cn
            delta = tmean - mean
            mean = mean + delta * (cn / tot)
            m2 = m2 + tm2 + delta * delta * (n * cn / tot)

    var = m2 / jnp.float32(r)
    invstd = jnp.float32(1.0) / jnp.sqrt(var + jnp.float32(1e-12))
    return mean.astype(x.dtype), invstd.astype(x.dtype)
