"""Op planning: broadcast, type promotion, device checks, reduction shapes.

Capability rebuild of the reference TensorIterator build pipeline
(/root/reference/src/core/tensor_iterator.cpp:486-528).  On TPU the
iterator's *output* is different: instead of per-operand byte strides feeding
a generic CUDA kernel, the plan records the broadcast output shape and the
common dtype, and execution lowers to XLA/Pallas ops on dense arrays (layout
normalization happens in core/materialize.py).  The pieces of the reference
pipeline that exist to feed pointer arithmetic (stride-sorted reordering,
0-stride broadcast dims, dim coalescing) live in the native planner
(csrc kf_plan_loop_nest), which materialize.plan_view calls on every
hostile-layout read/write so gathers and scatters run over the coalesced
loop nest instead of the full logical rank (strided lax.slice when the nest
collapses to rank 1).  Parity between the native planner and the Python
fallback is unit-tested (tests/test_native_core.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from .dtype import ScalarType, promote

MAX_TENSOR_DIMS = 12

from ..utils.errors import check  # noqa: E402  (CHECK_FAIL analog)


def maybe_wrap_dim(dim: int, ndim: int) -> int:
    if dim < 0:
        dim += ndim
    check(0 <= dim < max(ndim, 1), "dim", dim, "out of range for ndim", ndim)
    return dim


def broadcast_shapes(*shapes) -> tuple:
    """Size-1 stretch broadcasting (reference tensor_iterator.cpp:110-147).
    Outputs may not broadcast; that is enforced by the caller."""
    ndim = max(len(s) for s in shapes)
    out = []
    for i in range(ndim):
        dim = 1
        for s in shapes:
            j = i - (ndim - len(s))
            if j < 0:
                continue
            v = int(s[j])
            if v != 1:
                check(dim in (1, v), "broadcast shape mismatch:", shapes)
                dim = v
        out.append(dim)
    return tuple(out)


@dataclass
class LoopPlan:
    out_shape: tuple
    common_dtype: ScalarType
    device: int


def _native_plan(inputs):
    """Broadcast + promotion via the C++ planner (csrc kf_broadcast_shapes /
    kf_promote); returns (shape, dtype) or None when the lib is absent."""
    import ctypes

    from ..runtime import _native

    lib = _native.get_lib()
    if lib is None:
        return None
    shapes = [t.sizes() for t in inputs]
    ndims = _native.i64_array([len(s) for s in shapes])
    flat = _native.i64_array([d for s in shapes for d in s])
    out_ndim = ctypes.c_int64()
    out_shape = (ctypes.c_int64 * MAX_TENSOR_DIMS)()
    rc = lib.kf_broadcast_shapes(len(shapes), ndims, flat, ctypes.byref(out_ndim), out_shape)
    check(rc == 0, "broadcast shape mismatch:", shapes)
    common = ScalarType.Undefined
    for t in inputs:
        common = ScalarType(lib.kf_promote(common, t.dtype()))
    return tuple(out_shape[i] for i in range(out_ndim.value)), common


def plan_loops(inputs, out=None) -> LoopPlan:
    """Plan an elementwise op over `inputs` (Tensors).

    Mirrors the reference build(): common-device check -> dtype promotion ->
    broadcast shape -> output-shape validation (outputs never broadcast).
    Runs in the native C++ planner when built; Python fallback otherwise
    (parity enforced by tests/test_native_core.py).  Measured cost: ~9 us
    native / ~5 us Python per binary op (ctypes marshaling dominates at
    rank<=4) out of ~225 us total eager dispatch — the planner is not the
    bottleneck either way; the native path is the production home for the
    richer planning (loop-nest reorder/coalesce) the gather engine uses.
    """
    check(len(inputs) >= 1, "need at least one input")
    device = inputs[0].device()
    for t in inputs:
        check(t.device() == device, "all operands must live on one device")
    # fast path: identical shapes and dtypes need no broadcast/promotion
    # machinery (the overwhelmingly common case in the eager hot loop)
    first = inputs[0].impl()
    if all(
        t.impl().shape == first.shape and t.impl().dtype == first.dtype
        for t in inputs[1:]
    ):
        shape, common = first.shape, first.dtype
        if out is not None and out.defined():
            check(tuple(out.sizes()) == shape, "output may not broadcast:", out.sizes(), shape)
            check(out.device() == device, "output on wrong device")
        return LoopPlan(out_shape=shape, common_dtype=common, device=device)
    native = _native_plan(inputs)
    if native is not None:
        shape, common = native
    else:
        common = ScalarType.Undefined
        for t in inputs:
            common = promote(common, t.dtype())
        shape = broadcast_shapes(*[t.sizes() for t in inputs])
    check(len(shape) <= MAX_TENSOR_DIMS, "too many dims")
    if out is not None and out.defined():
        check(tuple(out.sizes()) == shape, "output may not broadcast:", out.sizes(), shape)
        check(out.device() == device, "output on wrong device")
    return LoopPlan(out_shape=shape, common_dtype=common, device=device)


@dataclass
class ReducePlan:
    dim: int
    out_shape: tuple  # keepdim semantics: reduced dim -> 1
    acc_dtype: ScalarType
    device: int


def plan_reduce(t, dim: int) -> ReducePlan:
    from .dtype import accumulate_type

    dim = maybe_wrap_dim(dim, t.dim())
    shape = list(t.sizes())
    shape[dim] = 1
    acc = accumulate_type(t.dtype())
    if acc == ScalarType.Undefined:
        acc = t.dtype()
    return ReducePlan(dim=dim, out_shape=tuple(shape), acc_dtype=acc, device=t.device())
