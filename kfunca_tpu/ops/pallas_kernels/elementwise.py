"""Pallas elementwise kernel family (contiguous fast path).

The TPU analog of the reference's vectorized elementwise engine
(/root/reference/src/device/utils/tensor_loops.h:49-103: register-buffered
load -> unrolled apply -> store).  One templated kernel serves every arity,
like the reference's function_traits-driven gpu_kernel.

Role: XLA already emits speed-of-light fused loops for elementwise chains
(the ops are HBM-bandwidth-bound), so XLA is the default engine.  This
family is dispatched from the fused eager engine (core/dispatch.py) when
KFUNCA_ELEMENTWISE_ENGINE=pallas is set on a real TPU — an A/B knob, read
at dispatch time — for registered ops on broadcast-free, 128-lane-divisible
shapes; everything else takes the XLA path.  bench.py reports both engines.
"""

from __future__ import annotations

import functools

import jax
import numpy as _np
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv

LANES = 128
# rows per block: 8 sublanes * 128 lanes * 512 = 512K elements per grid step
BLOCK_ROWS = 4096

_FUNCS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: lax.div(a, b) if jnp.issubdtype(a.dtype, jnp.integer) else a / b,
    "copy": lambda a: a,
    "neg": lambda a: -a,
    "abs": lambda a: jnp.abs(a),
    "exp": lambda a: jnp.exp(a),
}


def _ew_kernel(*refs, name, acc_dt, out_dt):
    out_ref = refs[-1]
    args = [r[:].astype(acc_dt) for r in refs[:-1]]
    out_ref[:] = _FUNCS[name](*args).astype(out_dt)


def eligible(shape_numel: int) -> bool:
    return shape_numel % LANES == 0 and shape_numel >= LANES


@functools.partial(jax.jit, static_argnames=("name", "acc_dt", "out_dt", "interpret"))
def elementwise(name, *arrays, acc_dt, out_dt, interpret=False):
    """Apply `name` elementwise over same-shape contiguous arrays.

    Math runs in acc_dt, stores in out_dt (the reference's acc-type contract,
    binary_ops_kernel.cu:34-60).
    """
    n = arrays[0].size
    assert eligible(n), n
    rows = n // LANES
    flat = [a.reshape(rows, LANES) for a in arrays]
    block_rows = min(BLOCK_ROWS, rows)
    kernel = functools.partial(_ew_kernel, name=name, acc_dt=acc_dt, out_dt=out_dt)
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(rows, block_rows),),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, _np.int32(0))) for _ in flat],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, _np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), out_dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*flat)
    return out.reshape(arrays[0].shape)
