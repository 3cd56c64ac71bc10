"""Pallas GEMM block sweep on real TPU (4096^3 bf16), median-of-3 slope."""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def _timed(fn, iters=6):
    _sync(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def slope(mk, k1, k2, label):
    f1, f2 = mk(k1), mk(k2)
    ss = []
    for r in range(3):
        t1, t2 = _timed(f1), _timed(f2)
        ss.append(max((t2 - t1) / (k2 - k1), 1e-9))
        print(f"  {label}[{r}]: {ss[-1]*1e3:.3f} ms", flush=True)
    ss.sort()
    return ss[1]


def main():
    from kfunca_tpu.ops.pallas_kernels.matmul import matmul

    m = k = n = 4096
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)
    flops = 2 * m * k * n

    configs = [
        (2048, 512, 2048),   # round-1 default
        (2048, 1024, 2048),
        (2048, 2048, 1024),
        (1024, 1024, 4096),
        (4096, 512, 2048),
        (2048, 1024, 4096),
        (512, 2048, 4096),
    ]
    for bm, bn, bk in configs:
        def chain(K, bm=bm, bn=bn, bk=bk):
            @jax.jit
            def f(x, y):
                for _ in range(K):
                    x = matmul(x, y, bm=bm, bn=bn, bk=bk)
                return x
            return lambda: f(a, b)
        dt = slope(chain, 8, 40, f"gemm {bm}x{bn}x{bk}")
        print(f"GEMM {bm}x{bn}x{bk}: {dt*1e3:.3f} ms = {flops/dt/1e12:.1f} TFLOP/s", flush=True)

    def chain_xla(K):
        @jax.jit
        def f(x, y):
            for _ in range(K):
                x = jnp.matmul(x, y, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return x
        return lambda: f(a, b)
    dt = slope(chain_xla, 8, 40, "gemm-xla")
    print(f"GEMM XLA: {dt*1e3:.3f} ms = {flops/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
