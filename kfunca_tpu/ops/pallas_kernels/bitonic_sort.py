"""Pallas bitonic segmented sort: stable, with index payload.

TPU-native replacement for the engine of the reference's radix machinery
(sorting_radix_sort.h): the CUDA design ranks 4-bit digits through shared-
memory scatter, which the TPU lacks; the natural TPU engine is a bitonic
network where every compare-exchange is a lane-rotate (pltpu.roll) + select
across a (rows, N) VMEM tile — pure VPU work, no data-dependent addressing.

Contract pieces preserved from the reference:
  * stability: the network sorts (key, index) pairs lexicographically —
    unique indices make any comparison sort order-deterministic and equal
    to the stable order;
  * the host wrapper (ops/sort.py) keeps the dense-relayout + dim-last
    segmentation and the order-reversing key transforms for descending
    (float negate / int bitwise-NOT, both exactly invertible);
  * int64 index output (widened on the host; the kernel carries int32).

Segments are padded to a power of two with +inf / INT_MAX sentinel keys
(they sort to the tail and are sliced off).  Segments above MAX_N fall back
to XLA's sort on the dispatch level.  Measured verdict (docs/SORT_ENGINE.md,
slope-timed on v5e): XLA's sort is FASTER — (8192,512) f32 runs 1.19 ms via
lax.sort vs 2.58 ms here — so this kernel is opt-in (KFUNCA_PALLAS_SORT=1)
and kept as the tuning substrate, not the default engine.
"""

from __future__ import annotations

import functools

import jax
import numpy as _np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up

MAX_N = 8192  # kernel capability (VMEM bound); see DISPATCH_MAX_N below

# Largest padded segment the TPU *dispatcher* uses. n=1024 compiles in ~4 s
# on v5e; n>=2048 networks reproducibly hang the remote Mosaic compile
# helper (three independent attempts wedged at the same point), so dispatch
# stays at 1024 until the compiler issue is understood — larger segments
# take the XLA sort fallback. Interpret mode (tests) is unaffected.
DISPATCH_MAX_N = 1024


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _sort_kernel(k_ref, i_ref, ko_ref, io_ref, *, n):
    """Full bitonic network over the (R, n) block; n is a power of two."""
    k = k_ref[:]
    i = i_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)

    size = 2
    while size <= n:
        # per-lane direction: blocks of `size` alternate asc/desc; the final
        # pass (size == n) is all-ascending since lane < n
        desc = (lane & _np.int32(size)) != 0
        d = size // 2
        while d >= 1:
            is_lower = (lane & _np.int32(d)) == 0
            # partner at lane i+d for lower halves, i-d for upper; pltpu.roll
            # needs non-negative shifts, so -d is expressed as n-d
            pk = jnp.where(is_lower, pltpu.roll(k, _np.int32(n - d), 1), pltpu.roll(k, _np.int32(d), 1))
            pi = jnp.where(is_lower, pltpu.roll(i, _np.int32(n - d), 1), pltpu.roll(i, _np.int32(d), 1))
            gt = (k > pk) | ((k == pk) & (i > pi))
            lt = (k < pk) | ((k == pk) & (i < pi))
            want_min = is_lower ^ desc
            # boolean select via bitwise ops: jnp.where on bool operands
            # lowers to an i8->i1 truncation Mosaic rejects
            take = (want_min & gt) | (~want_min & lt)
            k = jnp.where(take, pk, k)
            i = jnp.where(take, pi, i)
            d //= 2
        size *= 2

    ko_ref[:] = k
    io_ref[:] = i


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_pairs(keys, interpret=False):
    """keys: (rows, n) f32/i32 -> (sorted_keys, indices int32), stable asc.

    Sentinel-pads n up to a power of two (and rows to the tile), sorts, and
    slices the valid region back out.
    """
    rows, n = keys.shape
    np2 = _next_pow2(max(n, 128))
    assert np2 <= MAX_N, (n, np2)
    # row blocks capped at 128: Mosaic compile time explodes on big tiles
    # (an (848,1024) block hangs the compiler; (128,1024) compiles in seconds)
    rblock = max(8, min(round_up(rows, 8), 128, max(8, (1 << 21) // np2)))
    rp = round_up(rows, rblock)

    if jnp.issubdtype(keys.dtype, jnp.integer):
        sentinel = jnp.array(_np.iinfo(_np.int32).max, keys.dtype)
    else:
        sentinel = jnp.array(_np.inf, keys.dtype)
    kp = jnp.full((rp, np2), sentinel, keys.dtype)
    kp = jax.lax.dynamic_update_slice(kp, keys, (jnp.int32(0), jnp.int32(0)))
    idx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, np2), 1), (rp, np2)
    )

    ks, isrt = pl.pallas_call(
        functools.partial(_sort_kernel, n=np2),
        grid=(rp // rblock,),
        in_specs=[
            pl.BlockSpec((rblock, np2), lambda r: (r, _np.int32(0))),
            pl.BlockSpec((rblock, np2), lambda r: (r, _np.int32(0))),
        ],
        out_specs=[
            pl.BlockSpec((rblock, np2), lambda r: (r, _np.int32(0))),
            pl.BlockSpec((rblock, np2), lambda r: (r, _np.int32(0))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, np2), keys.dtype),
            jax.ShapeDtypeStruct((rp, np2), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kp, idx)
    return ks[:rows, :n], isrt[:rows, :n]
