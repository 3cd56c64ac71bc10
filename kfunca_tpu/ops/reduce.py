"""Reduction family: sum / mean / mean_var (Welford) / norm_stat.

Rebuild of the reference reduction engine (reduce_ops.cpp,
tensor_reduce.h:994-1083, welford_norm.h).  Contracts preserved:

  * keepdim outputs (reduced dim -> extent 1; reference iterator
    build_for_reduce, tensor_iterator.cpp:60-76),
  * accumulation in the widened dtype (fp16/bf16 -> fp32, int -> int64;
    reference acc_type mapping), output in the input dtype,
  * mean_var(dim, take_sqrt) -> (mean, var) with correction=1 (unbiased;
    reference reduce_ops.cpp:22-28), sqrt applied to var when requested,
  * norm_stat(dim) -> (mean, invstd) with biased variance and eps=1e-12
    (reference norm_ops_kernel.cu:6-61).

Engine: XLA reductions by default EVERYWHERE — chosen from the round-3
interleaved TPU A/B (bench.py bench_reduce_engines; see _reduce_engine
below for the numbers).  KFUNCA_REDUCE_ENGINE=pallas dispatches the
single-pass Pallas kernels (ops/pallas_kernels/{reduce,welford}.py) — the
grid is sequential per core, so the reference's staging-buffer + semaphore
dance (welford_norm.h:122-177) collapses into a VMEM accumulator loop;
they remain the tuning substrate, 1.7x behind XLA on the welford shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.dtype import ScalarType, to_jnp
from ..core.iterator import check, plan_reduce
from ..core.tensor import GradFunction, Tensor, empty
from ..runtime.backend import use_pallas
from ..runtime.launcher import Launcher


class SumGradFunction(GradFunction):
    """Broadcast the output grad back over the reduced dim (extension; the
    reference has no reduction autograd)."""

    def __init__(self, t: Tensor, scale: float):
        super().__init__([t])
        self.scale = scale

    def backward(self, grad_output: Tensor):
        from .elementwise import wrap_array

        t = self.inputs[0]
        g = grad_output._array().astype(to_jnp(t.dtype()))
        g = jnp.broadcast_to(g, tuple(t.sizes())) * self.scale
        return [wrap_array(g, t.dtype(), t.device())]


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _sum_jit(A, dim, acc_dt, out_dt, mean: bool):
    r = jnp.sum(A.astype(acc_dt), axis=dim, keepdims=True)
    if mean:
        r = r / A.shape[dim]
    return r.astype(out_dt)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _pallas_reduce_jit(A, dim, out_dt, mean: bool):
    from .pallas_kernels.reduce import reduce_2d

    A = jnp.moveaxis(A, dim, 0)
    r = reduce_2d(A.reshape(A.shape[0], -1), op="mean" if mean else "sum", out_dt=out_dt)
    return jnp.moveaxis(r.reshape((1,) + A.shape[1:]), 0, dim)


def _reduce_engine() -> str:
    """SUM/MEAN engine, read at DISPATCH time.  XLA is the default for
    plain reductions (round-3/4 A/Bs never measured it slower; NB the
    round-3 4096^2 chains were VMEM-residency artifacts — see
    bench_reduce_engines).  norm_stat has its OWN default (below): the
    round-4 raw-moments Welford kernel measured 1.56 ms vs XLA's 2.97 on
    the 16387^2 shape (84% of the 1.31 ms HBM floor; the round-3 kernel's
    5.0 ms was the host pad copy + per-element masking,
    pallas_kernels/welford.py), so Pallas IS the norm_stat production
    engine.  KFUNCA_REDUCE_ENGINE overrides both ('pallas' forces the
    Pallas sum substrate, 'xla' forces XLA everywhere)."""
    import os

    return os.environ.get("KFUNCA_REDUCE_ENGINE", "xla")


def _norm_stat_engine() -> str:
    import os

    return os.environ.get("KFUNCA_REDUCE_ENGINE", "pallas")


def _reduce_common(t: Tensor, dim: int, mean: bool) -> Tensor:
    plan = plan_reduce(t, dim)
    out = empty(plan.out_shape, t.dtype(), plan.device)
    launcher = Launcher.instance()
    name = "mean" if mean else "sum"
    if (
        _reduce_engine() == "pallas"
        and use_pallas()
        and plan.acc_dtype in (ScalarType.Float,)
        and t.numel() >= 1 << 16
    ):
        out._write(
            launcher.submit(
                _pallas_reduce_jit, t._array(), plan.dim, to_jnp(t.dtype()), mean, name=name
            )
        )
    else:
        out._write(
            launcher.submit(
                _sum_jit,
                t._array(),
                plan.dim,
                to_jnp(plan.acc_dtype),
                to_jnp(t.dtype()),
                mean,
                name=name,
            )
        )
    if t.requires_grad():
        out.set_requires_grad(True)
        out.set_grad_fn(SumGradFunction(t, 1.0 / t.shape(plan.dim) if mean else 1.0))
    return out


def sum(t: Tensor, dim: int) -> Tensor:  # noqa: A001 - mirrors reference API
    return _reduce_common(t, dim, mean=False)


def mean(t: Tensor, dim: int) -> Tensor:
    return _reduce_common(t, dim, mean=True)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _mean_var_jit(A, dim, acc_dt, correction, take_sqrt):
    A = A.astype(acc_dt)
    n = A.shape[dim]
    m = jnp.mean(A, axis=dim, keepdims=True)
    var = jnp.sum((A - m) * (A - m), axis=dim, keepdims=True) / jnp.maximum(n - correction, 1)
    if take_sqrt:
        var = jnp.sqrt(var)
    return m, var


def mean_var(t: Tensor, dim: int, take_sqrt: bool):
    plan = plan_reduce(t, dim)
    m, v = Launcher.instance().submit(
        _mean_var_jit, t._array(), plan.dim, to_jnp(plan.acc_dtype), 1, bool(take_sqrt),
        name="mean_var",
    )
    out_m = empty(plan.out_shape, t.dtype(), plan.device)
    out_v = empty(plan.out_shape, t.dtype(), plan.device)
    out_m._write(m)
    out_v._write(v)
    return out_m, out_v


@partial(jax.jit, static_argnums=(1, 2))
def _norm_stat_jit(A, dim, acc_dt):
    A = A.astype(acc_dt)
    m = jnp.mean(A, axis=dim, keepdims=True)
    var = jnp.mean((A - m) * (A - m), axis=dim, keepdims=True)
    invstd = 1.0 / jnp.sqrt(var + 1e-12)
    return m, invstd


def norm_stat(t: Tensor, dim: int):
    """Fused batch-norm-style statistics: (mean, invstd) reducing `dim`
    (reference welford_norm.h + norm_ops_kernel.cu; eps=1e-12)."""
    plan = plan_reduce(t, dim)
    check(plan.acc_dtype in (ScalarType.Float, ScalarType.Double), "norm_stat: float only")
    if (
        _norm_stat_engine() == "pallas"
        and use_pallas()
        and t.dim() == 2
        and plan.dim == 0
        and t.dtype() == ScalarType.Float
    ):
        from .pallas_kernels.welford import welford_norm_stat

        m, invstd = Launcher.instance().submit(
            welford_norm_stat, t._array(), name="norm_stat"
        )
    else:
        m, invstd = Launcher.instance().submit(
            _norm_stat_jit, t._array(), plan.dim, to_jnp(plan.acc_dtype), name="norm_stat"
        )
    out_m = empty(plan.out_shape, t.dtype(), plan.device)
    out_s = empty(plan.out_shape, t.dtype(), plan.device)
    out_m._write(m)
    out_s._write(invstd)
    return out_m, out_s
