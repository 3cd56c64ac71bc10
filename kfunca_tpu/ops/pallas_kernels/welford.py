"""Single-pass Welford statistics kernel: (R, C) -> (mean, invstd) over dim 0.

Rebuild of the reference's fused batch-norm statistics pass
(/root/reference/src/device/utils/welford_norm.h, norm_ops_kernel.cu:6-61).
The CUDA version needs per-thread Welford -> SLM vertical merge -> multi-block
staging buffers + semaphores.  On TPU the grid's row dimension is sequential
per core, so the entire reduction is a VMEM accumulator loop with the same
numerically-stable chunk merge (welford_merge, welford_norm.h:270-301) and no
synchronization at all.

Contract: eps = 1e-12, invstd = 1/sqrt(m2/R + eps), fp32.
"""

from __future__ import annotations

import functools

import jax
import numpy as _np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import pad_to, pick_block, round_up


def _welford_kernel(x_ref, mean_ref, invstd_ref, mean_acc, m2_acc, cnt_acc, *, rows, br):
    ir = pl.program_id(1)

    @pl.when(ir == 0)
    def _init():
        mean_acc[:] = jnp.zeros_like(mean_acc)
        m2_acc[:] = jnp.zeros_like(m2_acc)
        cnt_acc[:] = jnp.zeros_like(cnt_acc)

    x = x_ref[:].astype(jnp.float32)  # (br, bc)
    # valid-row mask for the ragged tail (padding must not perturb stats)
    row_ids = ir * br + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = (row_ids < rows).astype(jnp.float32)
    cn = jnp.sum(valid, axis=0, keepdims=True)  # (1, bc)
    cn_safe = jnp.maximum(cn, jnp.float32(1.0))
    xm = x * valid
    cmean = jnp.sum(xm, axis=0, keepdims=True) / cn_safe
    cm2 = jnp.sum((x - cmean) * (x - cmean) * valid, axis=0, keepdims=True)

    # Welford chunk merge (reference welford_merge)
    n = cnt_acc[:]
    tot = n + cn
    tot_safe = jnp.maximum(tot, jnp.float32(1.0))
    delta = cmean - mean_acc[:]
    mean_acc[:] = mean_acc[:] + delta * (cn / tot_safe)
    m2_acc[:] = m2_acc[:] + cm2 + delta * delta * (n * cn / tot_safe)
    cnt_acc[:] = tot

    @pl.when(ir == pl.num_programs(1) - 1)
    def _store():
        var = m2_acc[:] / jnp.maximum(cnt_acc[:], jnp.float32(1.0))
        mean_ref[:] = mean_acc[:].astype(mean_ref.dtype)
        invstd_ref[:] = (jnp.float32(1.0) / jnp.sqrt(var + jnp.float32(1e-12))).astype(invstd_ref.dtype)


@functools.partial(jax.jit, static_argnames=("br", "bc", "interpret"))
def welford_norm_stat(x, br=512, bc=512, interpret=False):
    """x: (R, C) fp32 -> (mean (1, C), invstd (1, C))."""
    r, c = x.shape
    br = pick_block(r, br, align=8)
    bc = pick_block(c, bc)
    rp, cp = round_up(r, br), round_up(c, bc)
    xp = pad_to(x, (rp, cp))

    kernel = functools.partial(_welford_kernel, rows=r, br=br)
    mean, invstd = pl.pallas_call(
        kernel,
        grid=(cp // bc, rp // br),
        in_specs=[pl.BlockSpec((br, bc), lambda j, i: (i, j))],
        out_specs=[
            pl.BlockSpec((1, bc), lambda j, i: (_np.int32(0), j)),
            pl.BlockSpec((1, bc), lambda j, i: (_np.int32(0), j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, cp), x.dtype),
            jax.ShapeDtypeStruct((1, cp), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, bc), jnp.float32),  # running mean
            pltpu.VMEM((1, bc), jnp.float32),  # running m2
            pltpu.VMEM((1, bc), jnp.float32),  # running count
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp)
    return mean[:, :c], invstd[:, :c]
