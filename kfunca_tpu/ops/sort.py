"""Stable segmented sort + topk.

The reference implements a 4-bit LSD radix sort with block/upsweep/downsweep
kernels (sort_ops_kernel.cu, sorting_radix_sort.h) because GPUs need explicit
shared-memory ranking.  On TPU the idiomatic engine is XLA's variadic
`lax.sort` (a stable bitonic network tuned for the VPU), which preserves the
reference's contract exactly:

  * stable ascending/descending per segment (segments = every slice along
    `dim`; the host wrapper re-lays-out to dense dim-last, mirroring
    sort_ops_kernel.cu:521-551),
  * int64 index payload,
  * descending implemented as stable-ascending over an order-reversing key
    transform (float negate / int bitwise-NOT), which keeps equal elements
    in original order (same trick as the reference KeyTraits bit flips,
    sorting_common.h:22-238),
  * topk = sort + narrow(k) (reference topk_with_sort, sort_ops_kernel.cu:617-632).

Bool keys are unsupported, as in the reference (:565-566).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import ScalarType
from ..core.iterator import check, maybe_wrap_dim
from ..core.tensor import Tensor, empty
from ..runtime.launcher import Launcher


def _negate_keys(keys):
    """Order-reversing transform for descending sort.

    Integers use bitwise NOT (~x = -x-1): a strictly order-reversing
    bijection on the FULL two's-complement range.  Arithmetic negation
    would map INT64_MIN to itself (overflow), sorting the minimum FIRST in
    descending order — the same hazard the reference's bit-flip KeyTraits
    transforms avoid (sorting_common.h:22-238).  The sorted values are
    carried as a separate payload, so no inverse transform is needed."""
    if jnp.issubdtype(keys.dtype, jnp.integer):
        return ~keys.astype(jnp.int64)
    return -keys


@partial(jax.jit, static_argnums=(1, 2))
def _sort_jit(A, dim, descending):
    nd = A.ndim
    perm = tuple(i for i in range(nd) if i != dim) + (dim,)
    inv = tuple(sorted(range(nd), key=lambda i: perm[i]))
    At = A.transpose(perm)
    iota = lax.broadcasted_iota(jnp.int32, At.shape, nd - 1)
    keys = _negate_keys(At) if descending else At
    # variadic stable sort: sort (keys, values, indices) by keys only; values
    # carries the original elements so no inverse transform is needed.
    _, vals, idx = lax.sort((keys, At, iota), dimension=nd - 1, is_stable=True, num_keys=1)
    return vals.transpose(inv), idx.astype(jnp.int64).transpose(inv)


def _pallas_eligible(t: Tensor, dim: int) -> bool:
    """Opt-in (KFUNCA_PALLAS_SORT=1): slope-timed on v5e, XLA's sort runs
    (8192,512) f32 in 1.19 ms vs 2.58 ms for the bitonic kernel — XLA's
    engine is already strong, so it stays the default; the Pallas kernel is
    kept as the tuning substrate (see ROADMAP.md)."""
    import os

    from .pallas_kernels.bitonic_sort import DISPATCH_MAX_N, _next_pow2
    from ..runtime.backend import use_pallas

    if os.environ.get("KFUNCA_PALLAS_SORT", "0") != "1":
        return False
    if not use_pallas():
        return False
    if t.dtype() in (ScalarType.Double, ScalarType.Long, ScalarType.Bool):
        return False  # 64-bit keys are not Mosaic-friendly; XLA handles them
    return _next_pow2(max(t.shape(dim), 128)) <= DISPATCH_MAX_N


@partial(jax.jit, static_argnums=(1, 2))
def _pallas_sort_jit(A, dim, descending):
    """Dispatch to the Pallas bitonic kernel: dim -> last, dense rows,
    order-reversing key transform for descending (exactly invertible)."""
    from .pallas_kernels.bitonic_sort import bitonic_sort_pairs

    nd = A.ndim
    perm = tuple(i for i in range(nd) if i != dim) + (dim,)
    inv = tuple(sorted(range(nd), key=lambda i: perm[i]))
    At = A.transpose(perm)
    shape_t = At.shape
    n = shape_t[-1]
    flat = At.reshape(-1, n)

    if jnp.issubdtype(flat.dtype, jnp.integer):
        keys = flat.astype(jnp.int32)
        keys = ~keys if descending else keys
    else:
        keys = flat.astype(jnp.float32)
        keys = -keys if descending else keys
    skeys, sidx = bitonic_sort_pairs(keys)
    if jnp.issubdtype(flat.dtype, jnp.integer):
        vals = (~skeys if descending else skeys).astype(flat.dtype)
    else:
        vals = (-skeys if descending else skeys).astype(flat.dtype)
    vals = vals.reshape(shape_t).transpose(inv)
    idx = sidx.astype(jnp.int64).reshape(shape_t).transpose(inv)
    return vals, idx


def sort(t: Tensor, dim: int, descending: bool):
    check(t.dtype() != ScalarType.Bool, "sort: Bool unsupported")
    dim = maybe_wrap_dim(dim, t.dim())
    # every eager launch funnels through the Launcher (reference
    # Launcher::submit, launcher_cuda.h:315-353): sync/profiling observe it
    if _pallas_eligible(t, dim):
        vals, idx = Launcher.instance().submit(
            _pallas_sort_jit, t._array(), dim, bool(descending), name="sort"
        )
    else:
        vals, idx = Launcher.instance().submit(
            _sort_jit, t._array(), dim, bool(descending), name="sort"
        )
    out_v = empty(t.sizes(), t.dtype(), t.device())
    out_i = empty(t.sizes(), ScalarType.Long, t.device())
    out_v._write(vals)
    out_i._write(idx)
    return out_v, out_i


@partial(jax.jit, static_argnums=(1, 2, 3))
def _topk_jit(A, k, dim, largest):
    nd = A.ndim
    perm = tuple(i for i in range(nd) if i != dim) + (dim,)
    inv = tuple(sorted(range(nd), key=lambda i: perm[i]))
    At = A.transpose(perm)
    # lax.top_k up to k=2048: the XLA:TPU TopkEmitter crashes outright
    # above that (observed SIGABRT at k=2049 on v5e), but below it the
    # partial selection beats full-sort+narrow 1.4x (round-4 interleaved
    # A/B on (64, 65536) f32: 3.2 vs 4.5 ms at k in {512, 1024, 2048},
    # tools_r4_topk_welford.py; round 3 cut over to sort at k>256, leaving
    # that margin on the table).
    if largest and k <= 2048 and not jnp.issubdtype(At.dtype, jnp.integer):
        vals, idx = lax.top_k(At, k)  # VPU-friendly partial selection
    else:
        iota = lax.broadcasted_iota(jnp.int32, At.shape, nd - 1)
        keys = _negate_keys(At) if largest else At
        _, svals, sidx = lax.sort(
            (keys, At, iota), dimension=nd - 1, is_stable=True, num_keys=1
        )
        vals = lax.slice_in_dim(svals, 0, k, axis=nd - 1)
        idx = lax.slice_in_dim(sidx, 0, k, axis=nd - 1)
    return vals.transpose(inv), idx.astype(jnp.int64).transpose(inv)


def topk(t: Tensor, k: int, dim: int, largest: bool):
    check(t.dtype() != ScalarType.Bool, "topk: Bool unsupported")
    dim = maybe_wrap_dim(dim, t.dim())
    k = int(k)
    check(0 < k <= t.shape(dim), "topk: invalid k")
    if k > 256 and _pallas_eligible(t, dim):
        # reference semantics exactly: topk = full sort + narrow(k)
        # (topk_with_sort, sort_ops_kernel.cu:617-632), on the Pallas engine
        vals, idx = Launcher.instance().submit(
            _pallas_sort_jit, t._array(), dim, bool(largest), name="topk"
        )
        vals = lax.slice_in_dim(vals, 0, k, axis=dim)
        idx = lax.slice_in_dim(idx, 0, k, axis=dim)
    else:
        vals, idx = Launcher.instance().submit(
            _topk_jit, t._array(), k, dim, bool(largest), name="topk"
        )
    shape = list(t.sizes())
    shape[dim] = k
    out_v = empty(shape, t.dtype(), t.device())
    out_i = empty(shape, ScalarType.Long, t.device())
    out_v._write(vals)
    out_i._write(idx)
    return out_v, out_i
