"""Does Mosaic/TPU overlap independent MXU and VPU work in one kernel body?

Three kernels over the same grid:
  A: MXU only   — acc += a @ b per step
  B: VPU only   — w = exp2(w * c) chain per step (same tile area)
  C: both, independent — if T_C ~= max(T_A, T_B): overlap happens, and a
     lookahead-pipelined flash kernel (dot block t+1 while softmaxing block
     t) is worth building; if T_C ~= T_A + T_B: the units serialize and the
     ceiling argument changes.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 512  # tile side
STEPS = 2048


def _kernel(a_ref, b_ref, b2_ref, o_ref, acc, w, *, mode):
    # per-step shapes match the 512^2 flash step: two (512,512,128) dots on
    # the MXU, ~8 elementwise passes over a (512,512) f32 tile on the VPU
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        w[:] = jnp.ones_like(w)

    if mode in ("mxu", "both"):
        s = jax.lax.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
        acc[:] += jax.lax.dot(
            s.astype(jnp.bfloat16), b2_ref[:], preferred_element_type=jnp.float32
        )
    if mode in ("vpu", "both"):
        x = w[:]
        x = jnp.exp2(x * _np.float32(1e-6))
        x = jnp.maximum(x, _np.float32(0.5))
        x = x + _np.float32(1e-7)
        x = jnp.exp2(x * _np.float32(-1e-6))
        x = jnp.maximum(x, _np.float32(0.25))
        x = x * _np.float32(0.999999)
        w[:] = x

    @pl.when(t == STEPS - 1)
    def _store():
        o_ref[:] = acc[:] + w[:, :128].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("mode",))
def run(a, b, b2, mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((N, 128), lambda t: (0, 0)),
            pl.BlockSpec((128, N), lambda t: (0, 0)),
            pl.BlockSpec((N, 128), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((N, 128), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N, 128), jnp.float32),
            pltpu.VMEM((N, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(a, b, b2)


def _sync(x):
    _np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def _timed(fn, iters=6):
    _sync(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (N, 128), jnp.bfloat16)
    b = jax.random.normal(key, (128, N), jnp.bfloat16)
    b2 = jax.random.normal(key, (N, 128), jnp.bfloat16)

    # slope-timed chains (single calls disappear under the ~25 ms relay RTT)
    def chain(mode, K):
        @jax.jit
        def f(x, bb, bb2):
            for _ in range(K):
                x = run(x, bb, bb2, mode).astype(jnp.bfloat16)
            return x
        return lambda: f(a, b, b2)

    k1, k2 = 2, 8
    chains = {m: (chain(m, k1), chain(m, k2)) for m in ("mxu", "vpu", "both")}
    for r in range(3):
        for mode, (f1, f2) in chains.items():
            t1, t2 = _timed(f1), _timed(f2)
            dt = max((t2 - t1) / (k2 - k1), 1e-9)
            print(f"[overlap] r{r} {mode}: {dt*1e3:.3f} ms/call ({dt/STEPS*1e6:.3f} us/step)",
                  flush=True)


if __name__ == "__main__":
    main()
