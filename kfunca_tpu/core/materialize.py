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
  * anything else            -> flat gather (correct for arbitrary
    as_strided metadata, incl. overlapping views)

Writes mirror the same tiers with reshape / dynamic_update_slice / scatter.
All entry points are jitted with static view metadata, so each distinct
layout compiles once and is cached.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def contiguous_strides(shape) -> tuple:
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


@partial(jax.jit, static_argnums=(1, 2, 3), donate_argnums=())
def _gather_view(buf, shape, strides, offset):
    idx = jnp.full(shape, offset, dtype=_index_dtype(buf.shape[0]))
    for d, (n, s) in enumerate(zip(shape, strides)):
        if n > 1 and s != 0:
            idx = idx + lax.broadcasted_iota(idx.dtype, shape, d) * s
    return jnp.take(buf, idx.reshape(-1), axis=0).reshape(shape)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _transpose_view(buf, offset, span, sorted_shape, inv_order):
    block = lax.slice(buf, (offset,), (offset + span,))
    return block.reshape(sorted_shape).transpose(inv_order)


@partial(jax.jit, static_argnums=(1, 2))
def _slice_view(buf, offset, shape):
    n = numel_of(shape)
    return lax.slice(buf, (offset,), (offset + n,)).reshape(shape)


def read_view(buf: jax.Array, shape, strides, offset: int) -> jax.Array:
    """Materialize a strided view of a flat buffer as a dense array."""
    shape = tuple(int(x) for x in shape)
    strides = tuple(int(x) for x in strides)
    offset = int(offset)
    n = numel_of(shape)
    if is_contiguous(shape, strides):
        if offset == 0 and n == buf.shape[0]:
            return buf.reshape(shape)
        return _slice_view(buf, offset, shape)
    order, sorted_shape = _transpose_of_contiguous(shape, strides)
    if order is not None:
        return _transpose_view(buf, offset, n, sorted_shape, _inverse_perm(order))
    return _gather_view(buf, shape, strides, offset)


@partial(jax.jit, static_argnums=(2, 3, 4), donate_argnums=(0,))
def _scatter_write(buf, value, shape, strides, offset):
    idx = jnp.full(shape, offset, dtype=_index_dtype(buf.shape[0]))
    for d, (n, s) in enumerate(zip(shape, strides)):
        if n > 1 and s != 0:
            idx = idx + lax.broadcasted_iota(idx.dtype, shape, d) * s
    return buf.at[idx.reshape(-1)].set(value.reshape(-1).astype(buf.dtype))


@partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def _contig_write(buf, value, offset):
    return lax.dynamic_update_slice(
        buf, value.reshape(-1).astype(buf.dtype), (jnp.int32(offset),)
    )


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
    if is_contiguous(shape, strides):
        if offset == 0 and n == buf.shape[0]:
            return value.reshape(-1).astype(buf.dtype)
        return _contig_write(buf, value, offset)
    return _scatter_write(buf, value, shape, strides, offset)
