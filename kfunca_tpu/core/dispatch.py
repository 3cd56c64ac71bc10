"""Fused eager dispatch: ONE compiled program per (op, layouts, dtypes).

The reference's eager loop is TensorIterator::build + one kernel launch per
op call (/root/reference/src/core/tensor_iterator.cpp:486-528 feeding
tensor_loops.h:295-369).  Round 1 of this rebuild spent three jit dispatches
per eager op (materialize-read, compute, write) at ~225 us/op of host
overhead; this module collapses them into a single jitted program whose
trace

  1. reads every operand through its strided view (materialize.py traced
     tiers, incl. the native-planner-coalesced gather),
  2. computes in the accumulate dtype and casts to the common dtype
     (reference acc-type contract, binary_ops_kernel.cu:34-60),
  3. writes the result — flat for fresh outputs, or scattered through the
     out= view with the out buffer donated so XLA updates HBM in place.

Programs are keyed by hashable static metadata (op name, per-operand
(slot, shape, strides, offset), buffer dtypes/lengths via the jit cache) so
each distinct layout combination compiles exactly once; operands sharing a
storage share one buffer argument, which keeps donation sound for in-place
ops (a donated buffer is passed once even when read and written).

Every launch funnels through Launcher.submit, so set_sync_mode /
set_profiling_mode observe ALL eager ops (reference Launcher::submit,
launcher_cuda.h:315-353, sync_mode :290, profiling :336-349).

Engine choice: the compute step defaults to XLA (elementwise chains are
HBM-bandwidth-bound; XLA emits fused, fully-vectorized loops).  Setting
KFUNCA_ELEMENTWISE_ENGINE=pallas routes eligible ops (registered name,
no broadcast, 128-lane-divisible numel) through the Pallas elementwise
kernel family instead — read at DISPATCH time, not trace time, so flipping
the env var takes effect immediately (A/B benchmarking knob).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..runtime.launcher import Launcher
from ..utils.errors import check
from . import materialize as mat
from .dtype import to_jnp
from .overlap import may_self_overlap

# -- op registry --------------------------------------------------------------
# name -> fn(*acc_arrays) -> array (math in acc dtype; caller casts result)

_BINARY = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    # C-style trunc division for ints, true division for floats
    # (reference functor contract, binary_ops_kernel.cu:34-60)
    "div": lambda a, b: lax.div(a, b) if jnp.issubdtype(a.dtype, jnp.integer) else a / b,
}

_UNARY = {
    "copy": lambda x: x,
    "neg": lambda x: -x,
    "abs": jnp.abs,
    "exp": jnp.exp,
    "log": jnp.log,
    "sqrt": jnp.sqrt,
    "rsqrt": lax.rsqrt,
    "relu": lambda x: jnp.maximum(x, 0),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}

_OPS = {**_BINARY, **_UNARY}

# Ops the Pallas elementwise family implements (pallas_kernels/elementwise.py)
_PALLAS_OPS = ("add", "sub", "mul", "div", "copy", "neg", "abs", "exp")


# os.environ's Mapping.get routes through __getitem__, which raises and
# catches KeyError when the var is absent (~4 us per eager op).  Read the
# backing dict directly — os.environ.__setitem__/__delitem__ keep it in
# sync, so dispatch-time semantics (env flips apply to the NEXT op) hold.
_ENV_DATA = getattr(os.environ, "_data", None)
_EW_KEY = os.environ.encodekey("KFUNCA_ELEMENTWISE_ENGINE")     if _ENV_DATA is not None else None


def _elementwise_engine() -> str:
    if _ENV_DATA is not None:
        v = _ENV_DATA.get(_EW_KEY)
        if v is None or v == b"xla":
            return "xla"
    elif os.environ.get("KFUNCA_ELEMENTWISE_ENGINE", "xla") != "pallas":
        return "xla"
    from ..runtime.backend import use_pallas

    if use_pallas():  # real TPU only (and not KFUNCA_FORCE_XLA)
        return "pallas"
    return "xla"


# -- fused program construction ------------------------------------------------


@lru_cache(maxsize=None)
def _fused_program(
    op: str,
    in_metas: tuple,  # per input: (slot, shape, strides, offset)
    out_meta,  # None (fresh flat) | (slot|None, shape, strides, offset, whole)
    out_shape: tuple,  # broadcast result shape
    acc_dt,  # jnp dtype: math runs here (hashable; used directly as key)
    common_dt,  # jnp dtype: result dtype
    out_dt,  # storage dtype of out (dynamic-cast store), None if fresh
    has_scalar: bool,  # op == "fill" / "*_scalar": scalar rides as the LAST
    #                    traced operand — NOT baked into the program, so a
    #                    loop of varying scalars (lr schedules, 1/step
    #                    coefficients) hits one compiled program per dtype
    #                    instead of compiling (and caching) per value
    engine: str,
):

    def run(*args):
        if has_scalar:
            bufs, scalar = args[:-1], args[-1]
        else:
            bufs = args
        arrs = [
            mat.read_view_traced(bufs[slot], shape, strides, offset)
            for slot, shape, strides, offset in in_metas
        ]
        if op == "fill":
            r = jnp.full(out_shape, scalar, dtype=common_dt)
        elif op.endswith("_scalar"):
            a = arrs[0].astype(acc_dt)
            s = scalar.astype(acc_dt)
            r = _BINARY[op[: -len("_scalar")]](a, s).astype(common_dt)
        elif (
            engine == "pallas"
            and op in _PALLAS_OPS
            and all(a.shape == out_shape for a in arrs)
            and mat.numel_of(out_shape) % 128 == 0
            and mat.numel_of(out_shape) >= 128
        ):
            from ..ops.pallas_kernels.elementwise import elementwise as pl_ew

            r = pl_ew(op, *arrs, acc_dt=acc_dt, out_dt=common_dt)
        else:
            r = _OPS[op](*[a.astype(acc_dt) for a in arrs]).astype(common_dt)
        if r.shape != out_shape:
            r = jnp.broadcast_to(r, out_shape)
        if out_meta is None:
            return r.reshape(-1)
        slot, shape, strides, offset, whole = out_meta
        if whole:
            return r.reshape(-1).astype(out_dt)  # dynamic-cast store
        return mat.write_view_traced(bufs[slot], shape, strides, offset, r)

    donate = ()
    if out_meta is not None and out_meta[0] is not None:
        donate = (out_meta[0],)
    return jax.jit(run, donate_argnums=donate)


# scalar-operand cache: repeated scalar values (loop constants, 2.0, 1.0...)
# reuse one on-device 0-d array.  Keyed by raw bits so NaN hits the cache
# too; bounded FIFO so unbounded value streams (lr schedules) stay cheap
# without growing host memory.
#
# A NEVER-seen value does NOT pay a Python-side jnp.asarray (~170 us of
# pure dispatch machinery, round-4 measurement; the round-3 bench showed
# scalar_mul_varying at 484 us/op because every LR-schedule value missed):
# the raw 0-d numpy array is handed straight to the jitted program, whose
# C++ argument path converts it in ~14 us.  Only a value seen TWICE (a
# recurring constant) is promoted to a cached device array.
_SCALAR_CACHE: dict = {}
_SCALAR_SEEN: dict = {}
_SCALAR_CACHE_MAX = 1024


def _scalar_operand(value, dt):
    arr = np.asarray(value, dtype=dt)
    key = (arr.tobytes(), arr.dtype.str)
    cached = _SCALAR_CACHE.get(key)
    if cached is not None:
        return cached
    if key in _SCALAR_SEEN:  # second sight: recurring constant, promote
        if len(_SCALAR_CACHE) >= _SCALAR_CACHE_MAX:
            _SCALAR_CACHE.pop(next(iter(_SCALAR_CACHE)))
        cached = _SCALAR_CACHE[key] = jnp.asarray(arr)
        return cached
    if len(_SCALAR_SEEN) >= _SCALAR_CACHE_MAX:
        _SCALAR_SEEN.pop(next(iter(_SCALAR_SEEN)))
    _SCALAR_SEEN[key] = True
    return arr  # one-shot value: the jit C++ arg path converts it


# -- memoized hot-path dispatch ---------------------------------------------
#
# The general run_op path pays ~19 us of per-call Python (plan_loops,
# slot/meta construction, dtype conversions, program-key rebuild) even
# though every piece of it is a pure function of the operand LAYOUTS.  The
# fast table memoizes the complete dispatch decision — compiled program,
# result shape/dtype — under one small key, so a steady-state eager loop
# does: key build -> dict hit -> program(bufs) -> adopt_flat.  Misses seed
# the entry from the general path's own plan, so behavior is identical by
# construction (reference analog: TensorIterator::build is likewise the
# only per-call cost once the kernel is resolved, SURVEY §3.2).
_FAST_TABLE: dict = {}
_FAST_MAX = 1024


def fast_lookup(key):
    return _FAST_TABLE.get(key)


def fast_seed(key, op, in_metas, out_shape, acc_jnp, common_jnp,
              common_storage_dt, has_scalar):
    program = _fused_program(
        op, in_metas, None, tuple(out_shape), acc_jnp, common_jnp, None,
        has_scalar, key[-1],
    )
    if len(_FAST_TABLE) >= _FAST_MAX:
        _FAST_TABLE.clear()
    _FAST_TABLE[key] = (program, tuple(out_shape), common_storage_dt, acc_jnp)


def fast_engine():
    return _elementwise_engine()


def fast_scalar_operand(value, acc_jnp):
    return _scalar_operand(value, acc_jnp)


def _storage_slots(tensors):
    """Deduplicate storages into buffer slots (donation-sound aliasing)."""
    if len(tensors) == 2:  # hot path: binary op, distinct storages
        ia, ib = tensors[0].impl(), tensors[1].impl()
        sa, sb = ia.storage, ib.storage
        if sa is not sb:
            return [sa, sb], {id(sa): 0, id(sb): 1}, (
                (0, ia.shape, ia.strides, ia.offset),
                (1, ib.shape, ib.strides, ib.offset),
            )
    bufs, slot_of = [], {}

    def slot(storage):
        key = id(storage)
        if key not in slot_of:
            slot_of[key] = len(bufs)
            bufs.append(storage)
        return slot_of[key]

    metas = []
    for t in tensors:
        impl = t.impl()
        metas.append((slot(impl.storage), impl.shape, impl.strides, impl.offset))
    return bufs, slot_of, tuple(metas)


def run_op(op, inputs, out=None, out_shape=None, acc=None, common=None, fill_value=None):
    """Execute an eager elementwise op as one fused program.

    inputs: list[Tensor] (dense reads through their views)
    out:    optional Tensor written through its view (donated, in-place)
    out_shape: broadcast result shape (defaults to out's shape)
    acc/common: jnp dtypes for the math / result
    Returns the flat result array when out is None, else writes out's
    storage and returns None.
    """
    storages, slot_of, in_metas = _storage_slots(inputs)

    out_meta = None
    if out is not None:
        oimpl = out.impl()
        whole = (
            oimpl.numel == oimpl.storage.numel
            and oimpl.is_contiguous()
            and oimpl.offset == 0
        )
        if not whole:
            check(
                not may_self_overlap(oimpl.shape, oimpl.strides),
                "write through a self-overlapping view is rejected",
            )
        key = id(oimpl.storage)
        if whole and key not in slot_of:
            oslot = None  # buffer fully overwritten and not read: don't pass it
        else:
            if key not in slot_of:
                slot_of[key] = len(storages)
                storages.append(oimpl.storage)
            oslot = slot_of[key]
        out_meta = (oslot, oimpl.shape, oimpl.strides, oimpl.offset, whole)
        if out_shape is None:
            out_shape = oimpl.shape

    has_scalar = op == "fill" or op.endswith("_scalar")
    program = _fused_program(
        op,
        in_metas,
        out_meta,
        tuple(out_shape),
        acc,
        common,
        to_jnp(out.dtype()) if out is not None else None,
        has_scalar,
        _elementwise_engine(),
    )
    bufs = [s.read() for s in storages]
    if has_scalar:
        # traced 0-d operand in the scalar's semantic dtype (fill: storage
        # dtype; tensor-op-scalar: the promotion's acc dtype)
        bufs.append(_scalar_operand(fill_value, common if op == "fill" else acc))
    result = Launcher.instance().submit(program, *bufs, name=op)
    if out is None:
        return result
    out.impl().storage.write(result)
    return None
