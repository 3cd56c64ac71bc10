"""Strided-view reads/writes lowered to XLA.

This is the TPU-native replacement for the reference's strided elementwise
machinery (OffsetCalculator + legacy/unrolled kernels,
/root/reference/src/device/utils/tensor_offset_calculator.h:41-133 and
tensor_loops.h:295-355).  On GPU every op walks raw pointers with per-dim
div/mod; on TPU the idiomatic form is to normalize hostile layouts into
dense arrays *once* and let XLA fuse everything after:

  * contiguous view          -> zero-copy reshape / slice
  * permutation of a contiguous block -> slice + reshape + transpose
    (XLA lowers this to an efficient tiled relayout on the TPU vector unit)
  * planner-coalesced layouts -> the native loop-nest planner
    (csrc kf_plan_loop_nest, the analog of the reference's
    reorder_dimensions + coalesce_dimensions, tensor_iterator.cpp:181-307)
    reorders dims by stride and merges adjacent memory-contiguous dims, so
    a rank-k hostile view reads as a strided lax.slice (rank 1) or a
    low-rank gather instead of a full-rank gather
  * anything else            -> flat gather (correct for arbitrary
    as_strided metadata, incl. overlapping and negative-stride views)

Writes mirror the same tiers with reshape / dynamic_update_slice / scatter
(scatter indices are likewise planner-coalesced).

Every function here has a *traced* form usable inside an enclosing jit (the
fused eager dispatch in core/dispatch.py traces reads+compute+write into ONE
program) plus jitted standalone wrappers with static view metadata, so each
distinct layout compiles once and is cached.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax


def contiguous_strides(shape) -> tuple:
    # cached: the eager hot loop recomputes this for the same few shapes
    return _contiguous_strides(tuple(shape))


@lru_cache(maxsize=4096)
def _contiguous_strides(shape: tuple) -> tuple:
    strides = [1] * len(shape)
    acc = 1
    for d in range(len(shape) - 1, -1, -1):
        strides[d] = acc
        acc *= int(shape[d])
    return tuple(strides)


def is_contiguous(shape, strides) -> bool:
    # dims of extent 1 have don't-care strides (reference tensor_impl.cpp
    # computes contiguity the same way via the stride product test)
    acc = 1
    for d in range(len(shape) - 1, -1, -1):
        if shape[d] != 1 and strides[d] != acc:
            return False
        acc *= int(shape[d])
    return True


def numel_of(shape) -> int:
    return int(math.prod(shape)) if shape else 1


def _inverse_perm(perm):
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return tuple(inv)


def _transpose_of_contiguous(shape, strides):
    """If (shape, strides) is a permutation of a contiguous block, return the
    permutation `order` such that transpose(reshape(flat), inv(order)) == view."""
    ndim = len(shape)
    order = sorted(range(ndim), key=lambda d: (-strides[d], d))
    sorted_shape = tuple(shape[d] for d in order)
    if tuple(strides[d] for d in order) == contiguous_strides(sorted_shape):
        return order, sorted_shape
    return None, None


def _index_dtype(buf_len: int):
    return jnp.int64 if buf_len >= (1 << 31) else jnp.int32


# -- loop-nest planning (native planner production wiring) -------------------


def _plan_view_py(shape, strides):
    """Python fallback mirroring csrc kf_plan_loop_nest for one operand:
    stable-sort dims by descending stride (ties: larger extent first), then
    merge adjacent dims that are contiguous in memory."""
    ndim = len(shape)

    import functools

    def cmp(a, b):
        sa, sb = strides[a], strides[b]
        if sa != 0 and sb != 0:
            if sa != sb:
                return -1 if sa > sb else 1
            if shape[a] != shape[b]:
                return -1 if shape[a] > shape[b] else 1
        return 0

    perm = sorted(range(ndim), key=functools.cmp_to_key(cmp))
    nshp = [shape[p] for p in perm]
    nstr = [strides[p] for p in perm]
    cshape, cstr, gsize = [nshp[0]], [nstr[0]], [1]
    for d in range(1, ndim):
        if cshape[-1] == 1:
            cshape[-1], cstr[-1] = nshp[d], nstr[d]
            gsize[-1] += 1
        elif nshp[d] == 1:
            gsize[-1] += 1
        elif cstr[-1] == nstr[d] * nshp[d]:
            cshape[-1] *= nshp[d]
            cstr[-1] = nstr[d]
            gsize[-1] += 1
        else:
            cshape.append(nshp[d])
            cstr.append(nstr[d])
            gsize.append(1)
    return tuple(perm), tuple(nshp), tuple(cshape), tuple(cstr)


@lru_cache(maxsize=4096)
def plan_view(shape: tuple, strides: tuple):
    """Reordered+coalesced single-operand loop nest via the native planner
    (csrc kf_plan_loop_nest); returns (perm, permuted_shape, coalesced_shape,
    coalesced_strides).  Runs at trace time only (static metadata)."""
    from ..runtime import _native

    lib = _native.get_lib()
    ndim = len(shape)
    if lib is None or ndim == 0:
        return _plan_view_py(shape, strides) if ndim else None
    import ctypes

    out_shape = _native.i64_array([0] * ndim)
    out_strides = _native.i64_array([0] * ndim)
    out_perm = _native.i64_array([0] * ndim)
    out_gsize = _native.i64_array([0] * ndim)
    rank = lib.kf_plan_loop_nest(
        1,
        ndim,
        _native.i64_array(shape),
        _native.i64_array(strides),
        out_shape,
        out_strides,
        out_perm,
        out_gsize,
    )
    if rank < 0:
        return _plan_view_py(shape, strides)
    perm = tuple(out_perm[i] for i in range(ndim))
    nshp = tuple(shape[p] for p in perm)
    cshape = tuple(out_shape[i] for i in range(rank))
    cstrides = tuple(out_strides[i] for i in range(rank))
    return perm, nshp, cshape, cstrides


def _gather_indices(shape, strides, offset, idx_dt):
    idx = jnp.full(shape, offset, dtype=idx_dt)
    for d, (n, s) in enumerate(zip(shape, strides)):
        if n > 1 and s != 0:
            idx = idx + lax.broadcasted_iota(idx_dt, shape, d) * s
    return idx


# -- traced read tiers (usable inside an enclosing jit) -----------------------


def read_view_traced(buf, shape, strides, offset: int):
    """Materialize a strided view of a flat buffer as a dense array.
    Traceable: view metadata must be Python ints (static)."""
    shape = tuple(int(x) for x in shape)
    strides = tuple(int(x) for x in strides)
    offset = int(offset)
    n = numel_of(shape)
    if is_contiguous(shape, strides):
        if offset == 0 and n == buf.shape[0]:
            return buf.reshape(shape)
        return lax.slice(buf, (offset,), (offset + n,)).reshape(shape)
    order, sorted_shape = _transpose_of_contiguous(shape, strides)
    if order is not None:
        block = lax.slice(buf, (offset,), (offset + n,))
        return block.reshape(sorted_shape).transpose(_inverse_perm(order))
    # planner tier: reorder+coalesce, then slice/gather over fewer dims
    plan = plan_view(shape, strides)
    if plan is not None:
        perm, nshp, cshape, cstrides = plan
        inv = _inverse_perm(perm)
        if len(cshape) == 1 and cstrides[0] > 0:
            # rank-1 nest == strided slice (e.g. a matrix column)
            s, m = cstrides[0], cshape[0]
            block = lax.slice(buf, (offset,), (offset + (m - 1) * s + 1,), (s,))
            return block.reshape(nshp).transpose(inv)
        if len(cshape) == 1 and cstrides[0] == 0:
            block = jnp.broadcast_to(lax.slice(buf, (offset,), (offset + 1,)), (cshape[0],))
            return block.reshape(nshp).transpose(inv)
        if len(cshape) < len(shape) and all(s >= 0 for s in cstrides):
            # low-rank gather: indices built over the coalesced nest, then
            # relaid out to logical order (iota/transpose fuse; the gather
            # itself lands directly in logical order)
            idx = _gather_indices(cshape, cstrides, offset, _index_dtype(buf.shape[0]))
            idx = idx.reshape(nshp).transpose(inv)
            return jnp.take(buf, idx.reshape(-1), axis=0).reshape(shape)
    # fallback: full-rank flat gather (handles negative strides, overlap)
    idx = _gather_indices(shape, strides, offset, _index_dtype(buf.shape[0]))
    return jnp.take(buf, idx.reshape(-1), axis=0).reshape(shape)


def write_view_traced(buf, shape, strides, offset: int, value):
    """Write a dense array through a strided view of `buf`; returns the new
    flat buffer.  Traceable; the caller is responsible for the
    self-overlap check and for donation of `buf`."""
    shape = tuple(int(x) for x in shape)
    strides = tuple(int(x) for x in strides)
    offset = int(offset)
    n = numel_of(shape)
    if is_contiguous(shape, strides):
        if offset == 0 and n == buf.shape[0]:
            return value.reshape(-1).astype(buf.dtype)
        return lax.dynamic_update_slice(
            buf, value.reshape(-1).astype(buf.dtype), (jnp.int32(offset),)
        )
    plan = plan_view(shape, strides)
    if plan is not None and len(plan[2]) < len(shape):
        perm, nshp, cshape, cstrides = plan
        idx = _gather_indices(cshape, cstrides, offset, _index_dtype(buf.shape[0]))
        idx = idx.reshape(nshp).transpose(_inverse_perm(perm))
        return buf.at[idx.reshape(-1)].set(value.reshape(-1).astype(buf.dtype))
    idx = _gather_indices(shape, strides, offset, _index_dtype(buf.shape[0]))
    return buf.at[idx.reshape(-1)].set(value.reshape(-1).astype(buf.dtype))


# -- standalone jitted wrappers (one compile per distinct layout) -------------


@partial(jax.jit, static_argnums=(1, 2, 3))
def _read_view_jit(buf, shape, strides, offset):
    return read_view_traced(buf, shape, strides, offset)


@partial(jax.jit, static_argnums=(2, 3, 4), donate_argnums=(0,))
def _write_view_jit(buf, value, shape, strides, offset):
    return write_view_traced(buf, shape, strides, offset, value)


def read_view(buf: jax.Array, shape, strides, offset: int) -> jax.Array:
    """Materialize a strided view of a flat buffer as a dense array."""
    shape = tuple(int(x) for x in shape)
    strides = tuple(int(x) for x in strides)
    offset = int(offset)
    if (
        is_contiguous(shape, strides)
        and offset == 0
        and numel_of(shape) == buf.shape[0]
    ):
        return buf.reshape(shape)  # zero-copy (same-buffer) fast path
    return _read_view_jit(buf, shape, strides, offset)


def write_view(buf: jax.Array, shape, strides, offset: int, value: jax.Array) -> jax.Array:
    """Write a dense array into a strided view; returns the new flat buffer.

    Donation lets XLA update in place at the HBM level — the TPU-native
    equivalent of the reference kernels writing through raw pointers.
    Self-overlapping views are rejected (reference memory_overlap.h checks;
    such a write is a data race on GPU, a nondeterministic scatter here).
    """
    from ..utils.errors import check
    from .overlap import may_self_overlap

    shape = tuple(int(x) for x in shape)
    strides = tuple(int(x) for x in strides)
    offset = int(offset)
    check(
        not may_self_overlap(shape, strides),
        "write through a self-overlapping view is rejected",
    )
    n = numel_of(shape)
    if is_contiguous(shape, strides) and offset == 0 and n == buf.shape[0]:
        return value.reshape(-1).astype(buf.dtype)
    return _write_view_jit(buf, value, shape, strides, offset)
