"""Elementwise op family: add/sub/mul/div, fill, copy, dtype convert.

Rebuild of the reference elementwise engine (binary_ops.cpp +
tensor_loops.h): one generic execution path serves every arity, with the
reference's dtype contract preserved —

  * operands promote to a common dtype (iterator rule),
  * math runs in the *accumulation* dtype (fp16/bf16 compute in fp32,
    integers in int64; reference binary_ops_kernel.cu:34-60),
  * results store back in the common dtype, then cast to the output tensor's
    dtype when an explicit out is given (dynamic-cast store path).

On TPU the kernels themselves are XLA ops: elementwise chains are
HBM-bandwidth-bound and XLA already emits fused, fully-vectorized loops, so a
hand-written kernel can only match, not beat, them.  A Pallas variant of the
same family exists for the aligned contiguous fast path (ops/pallas_kernels/
elementwise.py) and is used on TPU when profitable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import (
    ScalarType,
    accumulate_type,
    is_floating_type,
    is_integral_type,
    to_jnp,
)
from ..core.iterator import plan_loops
from ..core.tensor import GradFunction, Tensor, empty


def wrap_array(arr, dtype: ScalarType, device: int) -> Tensor:
    """Wrap a dense jax.Array into a fresh contiguous Tensor."""
    out = empty(arr.shape, dtype, device)
    out._write(arr)
    return out


def _binary_math(name, A, B, acc_dt, common_dt):
    A = A.astype(acc_dt)
    B = B.astype(acc_dt)
    if name == "add":
        r = A + B
    elif name == "sub":
        r = A - B
    elif name == "mul":
        r = A * B
    elif name == "div":
        if jnp.issubdtype(acc_dt, jnp.integer):
            r = lax.div(A, B)  # C-style trunc division, like the reference functor
        else:
            r = A / B
    else:
        raise ValueError(name)
    return r.astype(common_dt)


@partial(jax.jit, static_argnums=(0, 3, 4))
def _binary_jit(name, A, B, acc_dt, common_dt):
    return _binary_math(name, A, B, acc_dt, common_dt)


@partial(jax.jit, static_argnums=(0, 3, 4))
def _binary_flat_jit(name, A, B, acc_dt, common_dt):
    """Same op, result pre-flattened inside the program: the fresh-output
    path then writes the storage with zero extra dispatches."""
    return _binary_math(name, A, B, acc_dt, common_dt).reshape(-1)


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
    plan = plan_loops([a, b], out=out)
    common = plan.common_dtype
    acc = accumulate_type(common)
    if acc == ScalarType.Undefined:
        acc = common
    if out is not None and out.defined():
        result = _binary_jit(name, a._array(), b._array(), to_jnp(acc), to_jnp(common))
        out._write(result)  # dynamic-cast store to out dtype
        return out
    flat = _binary_flat_jit(name, a._array(), b._array(), to_jnp(acc), to_jnp(common))
    out = empty(plan.out_shape, common, plan.device)
    out._write(flat)
    if track_grad and (a.requires_grad() or b.requires_grad()) and is_floating_type(common):
        out.set_requires_grad(True)
        out.set_grad_fn(BinaryGradFunction(name, a, b))
    return out


@partial(jax.jit, static_argnums=(1, 2))
def _fill_flat_jit(value, numel, dt):
    return jnp.full((numel,), value, dtype=dt)


def fill_(t: Tensor, value) -> Tensor:
    """Nullary fill (reference nullary_ops.cpp:6-14); value is cast to the
    tensor dtype, matching the any_t double carrier."""
    dt = to_jnp(t.dtype())
    if is_integral_type(t.dtype()):
        value = int(value)
    impl = t.impl()
    if impl.numel == impl.storage.numel and impl.is_contiguous() and impl.offset == 0:
        return t._write(_fill_flat_jit(float(value), impl.numel, dt))
    arr = jnp.full(tuple(t.sizes()), value, dtype=dt)
    return t._write(arr)


def copy_(dst: Tensor, src: Tensor) -> Tensor:
    """copy_ with broadcast + dtype cast (reference unary_ops.cpp copy_)."""
    plan = plan_loops([src], out=None)
    del plan
    arr = src._array()
    arr = jnp.broadcast_to(arr, tuple(dst.sizes()))
    return dst._write(arr)


def convert(t: Tensor, dtype: ScalarType) -> Tensor:
    """dtype conversion as a fresh contiguous tensor (reference
    unary_ops.cpp convert: CopyFunctor over the output dtype)."""
    out = empty(t.sizes(), dtype, t.device())
    out._write(t._array().astype(to_jnp(dtype)))
    return out


# -- unary math family (capability extension: the reference's unary layer has
#    only clone/copy/convert, unary_ops.cpp:7-24; these round out the eager
#    API with the same acc-dtype contract and tape autograd) ----------------

_UNARY_FWD = {
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


@partial(jax.jit, static_argnums=(0, 2, 3))
def _unary_jit(name, A, acc_dt, common_dt):
    return _UNARY_FWD[name](A.astype(acc_dt)).astype(common_dt)


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
    acc = accumulate_type(common)
    if acc == ScalarType.Undefined:
        acc = common
    result = _unary_jit(name, t._array(), to_jnp(acc), to_jnp(common))
    if out is not None and out.defined():
        out._write(result)
        return out
    out = empty(t.sizes(), common, t.device())
    out._write(result)
    if track_grad and t.requires_grad() and is_floating_type(common):
        out.set_requires_grad(True)
        out.set_grad_fn(UnaryGradFunction(name, t, out))
    return out
