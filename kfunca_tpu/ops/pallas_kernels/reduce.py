"""Generic Pallas reduction engine: sum/mean/max over one axis.

Rebuild of the reference reduction engine (tensor_reduce.h:994-1083).  The
CUDA engine needs ReduceConfig heuristics, SLM trees, warp shuffles and a
semaphore-guarded global-reduce finish; on TPU the grid's reduced dimension
runs sequentially per core, so the whole machine collapses to a VMEM
accumulator loop over row tiles — the same design as the Welford kernel
(welford.py), specialized to simple monoids.

Canonical form: the caller moves the reduced axis to the front and flattens
the rest, giving (R, C) -> (1, C).  fp32 accumulation for fp32/bf16/fp16
inputs (reference acc-type contract); integer reductions stay on the XLA
path (int64 accumulators are not Mosaic-friendly).
"""

from __future__ import annotations

import functools

import jax
import numpy as _np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import pad_to, pick_block, round_up

_INIT = {"sum": 0.0, "mean": 0.0, "max": -3.4e38}


def _reduce_kernel(x_ref, o_ref, acc_ref, *, op, rows, br):
    ir = pl.program_id(1)

    @pl.when(ir == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, _np.float32(_INIT[op]))

    x = x_ref[:].astype(jnp.float32)
    row_ids = ir * br + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = row_ids < rows
    if op == "max":
        x = jnp.where(valid, x, _np.float32(_INIT[op]))
        acc_ref[:] = jnp.maximum(acc_ref[:], jnp.max(x, axis=0, keepdims=True))
    else:
        x = jnp.where(valid, x, _np.float32(0.0))
        acc_ref[:] = acc_ref[:] + jnp.sum(x, axis=0, keepdims=True)

    @pl.when(ir == pl.num_programs(1) - 1)
    def _store():
        r = acc_ref[:]
        if op == "mean":
            r = r * _np.float32(1.0 / rows)
        o_ref[:] = r.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("op", "out_dt", "br", "bc", "interpret"))
def reduce_2d(x, op="sum", out_dt=None, br=512, bc=512, interpret=False):
    """(R, C) -> (1, C) reduction over dim 0 with fp32 accumulation."""
    r, c = x.shape
    out_dt = out_dt or x.dtype
    br = pick_block(r, br, align=8)
    bc = pick_block(c, bc)
    rp, cp = round_up(r, br), round_up(c, bc)
    xp = pad_to(x, (rp, cp))
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, op=op, rows=r, br=br),
        grid=(cp // bc, rp // br),
        in_specs=[pl.BlockSpec((br, bc), lambda j, i: (i, j))],
        out_specs=pl.BlockSpec((1, bc), lambda j, i: (_np.int32(0), j)),
        out_shape=jax.ShapeDtypeStruct((1, cp), out_dt),
        scratch_shapes=[pltpu.VMEM((1, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp)
    return out[:, :c]
