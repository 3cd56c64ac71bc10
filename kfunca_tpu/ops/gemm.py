"""GEMM: alpha * (A @ B).

Rebuild of the reference CUTLASS-backed gemm (gemm_kernel.cu:8-38,
launcher_cuda.h:537-614): A of any rank is flattened to (m, k), B must be
2-D, out = A.sizes with the last dim replaced by n (gemm_ops.cpp:6-16).

`beta` is accepted for reference API parity but is INERT: there is no C
operand to accumulate into — the reference applies beta to a freshly
allocated (uninitialized) output, i.e. garbage-in (gemm_ops.cpp:6-16), so
the only well-defined behavior is beta contributing nothing.  Passing
beta != 0 expecting an accumulate is a usage error; use `out = gemm(a, b,
alpha) + beta * c` instead.

On TPU the hot path is an MXU-tiled Pallas kernel
(ops/pallas_kernels/matmul.py) for fp32/bf16/fp16 with fp32 accumulation —
the reference only ever wires fp32/fp64 through CUTLASS, so the 16-bit paths
here are a strict capability extension.  fp64 falls back to XLA dot (the MXU
has no fp64; XLA emulates, matching the correctness contract).

matmul autograd (dA = alpha * g @ B^T, dB = alpha * A^T @ g) is an extension:
the reference has no gemm backward.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.dtype import ScalarType, is_floating_type, to_jnp
from ..core.iterator import check
from ..core.tensor import GradFunction, Tensor, empty
from ..runtime.backend import use_pallas

_PALLAS_DTYPES = (ScalarType.Float, ScalarType.BFloat16, ScalarType.Half)


def _gemm_engine() -> str:
    """Engine choice, read at DISPATCH time (never inside a trace — an env
    read inside a jitted function is baked at first trace and silently
    ignores later changes).  Mirrors the reference, which calls the vendor
    library (CUTLASS) for its GEMM: the TPU vendor path is XLA's dot
    (measured 190-203 TFLOP/s bf16 4096^3 on v5e), so it is the default;
    the in-house MXU-tiled Pallas kernel (the analog of the reference's
    hand-rolled WMMA block_gemm, except ours is live and tested) is
    selected with KFUNCA_GEMM_ENGINE=pallas and is the substrate for fused
    epilogues."""
    import os

    return os.environ.get("KFUNCA_GEMM_ENGINE", "xla")


def matmul_2d(A, B, out_dtype, engine: str | None = None):
    """(m,k) @ (k,n) with fp32 accumulation."""
    if engine is None:
        engine = _gemm_engine()  # only correct OUTSIDE jit; callers inside
        # a trace must resolve the engine at dispatch time and pass it in
    if (
        engine == "pallas"
        and use_pallas()
        and A.dtype in (jnp.float32, jnp.bfloat16, jnp.float16)
    ):
        from ..runtime.autotune import lookup, shape_bucket
        from .pallas_kernels.matmul import matmul as pallas_matmul

        # per-chip measured blocks (bench.py seeds the cache); swept v5e
        # constants in matmul() are the fallback
        tuned = lookup(
            "gemm", shape_bucket(A.shape[0], A.shape[1], B.shape[1]), A.dtype
        )
        return pallas_matmul(A, B, out_dtype=out_dtype, **(tuned or {}))
    acc = jnp.float64 if A.dtype == jnp.float64 else jnp.float32
    prec = jax.lax.Precision.HIGHEST if A.dtype == jnp.float32 else None
    return jnp.matmul(A, B, preferred_element_type=acc, precision=prec).astype(out_dtype)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _gemm_jit(A, B, alpha, beta, out_dt, engine):
    m = 1
    for s in A.shape[:-1]:
        m *= s
    r = matmul_2d(A.reshape(m, A.shape[-1]), B, out_dt, engine=engine)
    if alpha != 1.0:
        r = r * jnp.asarray(alpha, dtype=r.dtype)
    # beta scales the (zero-initialized) fresh output, contributing nothing;
    # kept in the signature for reference API parity (gemm_ops.cpp:6-16).
    return r.reshape(A.shape[:-1] + (B.shape[1],))


class GemmGradFunction(GradFunction):
    def __init__(self, a: Tensor, b: Tensor, alpha: float):
        super().__init__([a, b])
        self.alpha = alpha

    def backward(self, grad_output: Tensor):
        from .elementwise import wrap_array

        a, b = self.inputs
        g = grad_output._array()
        m = 1
        for s in g.shape[:-1]:
            m *= s
        g2 = g.reshape(m, g.shape[-1])
        A2 = a._array().reshape(m, a.shape(-1))
        dt = to_jnp(a.dtype())
        ga = (matmul_2d(g2, b._array().T, dt) * self.alpha).reshape(tuple(a.sizes()))
        gb = matmul_2d(A2.T, g2, dt) * self.alpha
        return [wrap_array(ga, a.dtype(), a.device()), wrap_array(gb, b.dtype(), b.device())]


def gemm(a: Tensor, b: Tensor, alpha: float = 1.0, beta: float = 0.0) -> Tensor:
    check(b.dim() == 2, "gemm: b must be 2-D")
    check(a.dim() >= 1, "gemm: a must have rank >= 1")
    check(a.dtype() == b.dtype(), "gemm: dtype mismatch")
    check(is_floating_type(a.dtype()), "gemm: floating dtypes only")
    check(a.shape(-1) == b.shape(0), "gemm: inner dims mismatch")
    out_shape = a.sizes()[:-1] + [b.shape(1)]
    out = empty(out_shape, a.dtype(), a.device())
    from ..runtime.launcher import Launcher

    out._write(
        Launcher.instance().submit(
            _gemm_jit,
            a._array(),
            b._array(),
            float(alpha),
            float(beta),
            to_jnp(a.dtype()),
            _gemm_engine(),
            name="gemm",
        )
    )
    if a.requires_grad() or b.requires_grad():
        out.set_requires_grad(True)
        out.set_grad_fn(GemmGradFunction(a, b, float(alpha)))
    return out
