"""Elementwise op family: add/sub/mul/div, fill, copy, dtype convert.

Rebuild of the reference elementwise engine (binary_ops.cpp +
tensor_loops.h): one generic execution path serves every arity, with the
reference's dtype contract preserved —

  * operands promote to a common dtype (iterator rule),
  * math runs in the *accumulation* dtype (fp16/bf16 compute in fp32,
    integers in int64; reference binary_ops_kernel.cu:34-60),
  * results store back in the common dtype, then cast to the output tensor's
    dtype when an explicit out is given (dynamic-cast store path).

Execution is the fused eager dispatch (core/dispatch.py): each op call is
ONE jitted program that reads operands through their strided views, computes
in the acc dtype, and writes the result, funneled through Launcher.submit.
The compute engine inside the program is XLA by default (elementwise chains
are HBM-bandwidth-bound and XLA emits fused, fully-vectorized loops);
KFUNCA_ELEMENTWISE_ENGINE=pallas routes eligible shapes through the Pallas
kernel family (ops/pallas_kernels/elementwise.py) instead.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import dispatch as _dsp
from ..core.dispatch import run_op
from ..core.dtype import (
    ScalarType,
    accumulate_type,
    is_floating_type,
    is_integral_type,
    to_jnp,
)
from ..core.iterator import plan_loops
from ..core.tensor import GradFunction, Tensor, adopt_flat, empty
from ..runtime.launcher import Launcher


def wrap_array(arr, dtype: ScalarType, device: int) -> Tensor:
    """Wrap a dense jax.Array into a fresh contiguous Tensor."""
    out = empty(arr.shape, dtype, device)
    out._write(arr)
    return out


def _acc_of(common: ScalarType) -> ScalarType:
    acc = accumulate_type(common)
    return common if acc == ScalarType.Undefined else acc


def _reduce_grad_to_shape(g_arr, shape):
    """Sum-reduce a broadcast gradient back to an input's shape."""
    extra = g_arr.ndim - len(shape)
    if extra > 0:
        g_arr = g_arr.sum(axis=tuple(range(extra)))
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and g_arr.shape[i] != 1)
    if axes:
        g_arr = g_arr.sum(axis=axes, keepdims=True)
    return g_arr


class BinaryGradFunction(GradFunction):
    """Tape node for add/sub/mul/div (generalizes reference AddGradFunction,
    binary_ops.cpp:18-28, to all four ops with broadcast-aware reduction)."""

    def __init__(self, name, a: Tensor, b: Tensor):
        super().__init__([a, b])
        self.name = name

    def backward(self, grad_output: Tensor):
        a, b = self.inputs
        g = grad_output._array()
        dt = grad_output.dtype()
        dev = grad_output.device()
        if self.name == "add":
            ga, gb = g, g
        elif self.name == "sub":
            ga, gb = g, -g
        elif self.name == "mul":
            ga = g * b._array().astype(g.dtype)
            gb = g * a._array().astype(g.dtype)
        elif self.name == "div":
            B = b._array().astype(g.dtype)
            ga = g / B
            gb = -g * a._array().astype(g.dtype) / (B * B)
        else:
            raise ValueError(self.name)
        ga = _reduce_grad_to_shape(ga, tuple(a.sizes()))
        gb = _reduce_grad_to_shape(gb, tuple(b.sizes()))
        return [wrap_array(ga, dt, dev), wrap_array(gb, dt, dev)]


def binary_op(name, a: Tensor, b: Tensor, out: Tensor | None = None, track_grad=True) -> Tensor:
    # memoized hot path: fresh-output, no-grad, distinct-storage binary —
    # the complete dispatch decision is a pure function of this key
    # (core/dispatch._FAST_TABLE); misses run the general path and seed
    fkey = None
    if out is None and not a.requires_grad() and not b.requires_grad():
        ia, ib = a.impl(), b.impl()
        if ia.storage is not ib.storage:
            fkey = (name, ia.shape, ia.strides, ia.offset, ia.dtype,
                    ib.shape, ib.strides, ib.offset, ib.dtype,
                    ia.storage.device, _dsp.fast_engine())
            hit = _dsp.fast_lookup(fkey)
            if hit is not None:
                program, out_shape, common, _acc_jnp = hit
                flat = Launcher.instance().submit(
                    program, ia.storage.read(), ib.storage.read(), name=name)
                return adopt_flat(flat, out_shape, common, ia.storage.device)
    plan = plan_loops([a, b], out=out)
    common = plan.common_dtype
    acc = _acc_of(common)
    if out is not None and out.defined():
        run_op(
            name, [a, b], out=out, out_shape=plan.out_shape,
            acc=to_jnp(acc), common=to_jnp(common),
        )
        return out
    flat = run_op(
        name, [a, b], out_shape=plan.out_shape, acc=to_jnp(acc), common=to_jnp(common)
    )
    if fkey is not None:
        ia, ib = a.impl(), b.impl()
        _dsp.fast_seed(
            fkey, name,
            ((0, ia.shape, ia.strides, ia.offset),
             (1, ib.shape, ib.strides, ib.offset)),
            plan.out_shape, to_jnp(acc), to_jnp(common), common, False)
    out = adopt_flat(flat, plan.out_shape, common, plan.device)
    if track_grad and (a.requires_grad() or b.requires_grad()) and is_floating_type(common):
        out.set_requires_grad(True)
        out.set_grad_fn(BinaryGradFunction(name, a, b))
    return out


def binary_scalar_op(name, t: Tensor, scalar, out: Tensor | None = None) -> Tensor:
    """Tensor-op-scalar as one fused program, the scalar passed as a traced
    0-d operand (semantics of the reference's `self op empty_like().fill_(s)`
    pattern, register.cpp:172-206 — the scalar adopts the tensor's dtype —
    without materializing the filled tensor, and without compiling per
    distinct scalar value)."""
    common = t.dtype()
    acc = _acc_of(common)
    scalar = int(scalar) if is_integral_type(common) else float(scalar)
    it = t.impl()
    shape = it.shape
    if out is None:  # memoized hot path (see binary_op)
        fkey = (name + "_scalar", it.shape, it.strides, it.offset, it.dtype,
                it.storage.device, _dsp.fast_engine())
        hit = _dsp.fast_lookup(fkey)
        if hit is not None:
            program, out_shape, common_dt, acc_jnp = hit
            flat = Launcher.instance().submit(
                program, it.storage.read(),
                _dsp.fast_scalar_operand(scalar, acc_jnp),
                name=name + "_scalar")
            return adopt_flat(flat, out_shape, common_dt, it.storage.device)
        flat = run_op(
            name + "_scalar", [t], out_shape=shape,
            acc=to_jnp(acc), common=to_jnp(common), fill_value=scalar,
        )
        _dsp.fast_seed(
            fkey, name + "_scalar",
            ((0, it.shape, it.strides, it.offset),),
            shape, to_jnp(acc), to_jnp(common), common, True)
        return adopt_flat(flat, shape, common, t.device())
    if out.defined():
        run_op(
            name + "_scalar", [t], out=out, out_shape=shape,
            acc=to_jnp(acc), common=to_jnp(common), fill_value=scalar,
        )
        return out
    flat = run_op(
        name + "_scalar", [t], out_shape=shape,
        acc=to_jnp(acc), common=to_jnp(common), fill_value=scalar,
    )
    return adopt_flat(flat, shape, common, t.device())


def fill_(t: Tensor, value) -> Tensor:
    """Nullary fill (reference nullary_ops.cpp:6-14); value is cast to the
    tensor dtype, matching the any_t double carrier."""
    if is_integral_type(t.dtype()):
        value = int(value)
    else:
        value = float(value)
    dt = to_jnp(t.dtype())
    run_op("fill", [], out=t, out_shape=tuple(t.sizes()), acc=dt, common=dt, fill_value=value)
    return t


def copy_(dst: Tensor, src: Tensor) -> Tensor:
    """copy_ with broadcast + dtype cast (reference unary_ops.cpp copy_)."""
    plan_loops([src], out=None)  # device check
    dt = to_jnp(dst.dtype())
    run_op("copy", [src], out=dst, out_shape=tuple(dst.sizes()), acc=dt, common=dt)
    return dst


def convert(t: Tensor, dtype: ScalarType) -> Tensor:
    """dtype conversion as a fresh contiguous tensor (reference
    unary_ops.cpp convert: CopyFunctor over the output dtype)."""
    dt = to_jnp(dtype)
    flat = run_op("copy", [t], out_shape=tuple(t.sizes()), acc=dt, common=dt)
    return adopt_flat(flat, tuple(t.sizes()), dtype, t.device())


# -- unary math family (capability extension: the reference's unary layer has
#    only clone/copy/convert, unary_ops.cpp:7-24; these round out the eager
#    API with the same acc-dtype contract and tape autograd) ----------------

_UNARY_GRAD = {
    "neg": lambda x, y, g: -g,
    "abs": lambda x, y, g: g * jnp.sign(x),
    "exp": lambda x, y, g: g * y,
    "log": lambda x, y, g: g / x,
    "sqrt": lambda x, y, g: g * 0.5 / y,
    "rsqrt": lambda x, y, g: g * (-0.5) * y / x,
    "relu": lambda x, y, g: g * (x > 0),
    "sigmoid": lambda x, y, g: g * y * (1 - y),
    "tanh": lambda x, y, g: g * (1 - y * y),
}


class UnaryGradFunction(GradFunction):
    def __init__(self, name, x: Tensor, y: Tensor):
        super().__init__([x])
        self.name = name
        self.y = y

    def backward(self, grad_output: Tensor):
        x = self.inputs[0]
        g = grad_output._array().astype(jnp.float32)
        gx = _UNARY_GRAD[self.name](
            x._array().astype(jnp.float32), self.y._array().astype(jnp.float32), g
        )
        return [wrap_array(gx.astype(to_jnp(x.dtype())), x.dtype(), x.device())]


def unary_op(name, t: Tensor, out: Tensor | None = None, track_grad=True) -> Tensor:
    common = t.dtype()
    acc = _acc_of(common)
    if out is not None and out.defined():
        run_op(
            name, [t], out=out, out_shape=tuple(t.sizes()),
            acc=to_jnp(acc), common=to_jnp(common),
        )
        return out
    flat = run_op(
        name, [t], out_shape=tuple(t.sizes()), acc=to_jnp(acc), common=to_jnp(common)
    )
    out = adopt_flat(flat, tuple(t.sizes()), common, t.device())
    if track_grad and t.requires_grad() and is_floating_type(common):
        out.set_requires_grad(True)
        out.set_grad_fn(UnaryGradFunction(name, t, out))
    return out
