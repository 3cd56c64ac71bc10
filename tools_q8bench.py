"""int8 GEMM block sweep (VERDICT task 5: >=355 TFLOP/s of the 394 roofline).

At the round-2 blocks (512,512,4096) each grid step DMAs 4 MB for 5.4 us of
MXU work — bandwidth-bound.  Bigger output tiles raise arithmetic intensity
(int8 operands are 1 byte, so 1024/2048 tiles fit VMEM easily).

Interleaved rounds; numerics pinned vs the int64 oracle on small shapes by
tests/test_quant.py (not re-checked here).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as _np

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from kfunca_tpu.ops.quant import matmul_q8  # noqa: E402


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
    m = n = k = 4096
    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (m, k), -127, 128, jnp.int8)
    b = jax.random.randint(key, (k, n), -127, 128, jnp.int8)
    sa = jnp.ones((m,), jnp.float32)
    sb = jnp.ones((n,), jnp.float32)
    flops = 2.0 * m * n * k

    configs = [
        (512, 512, 4096),   # round-2 default
        (1024, 1024, 2048),
        (1024, 1024, 4096),
        (2048, 2048, 1024),
        (2048, 1024, 2048),
        (1024, 2048, 2048),
    ]

    def chain(bm, bn, bk, K):
        @jax.jit
        def f(x, y, ra, cb):
            out = None
            for _ in range(K):
                out = matmul_q8(x, y, ra, cb, bm=bm, bn=bn, bk=bk)
                # non-foldable dependency: feed a data-dependent +-0 int8
                # back into x so XLA cannot CSE the chain
                bump = (out[0, 0] > jnp.bfloat16(1e30)).astype(jnp.int8)
                x = x + bump
            return out
        return lambda: f(a, b, sa, sb)

    k1, k2 = 8, 40
    chains = {c: (chain(*c, k1), chain(*c, k2)) for c in configs}
    results = {c: [] for c in configs}
    for r in range(5):
        for c, (f1, f2) in chains.items():
            t1, t2 = _timed(f1), _timed(f2)
            dt = max((t2 - t1) / (k2 - k1), 1e-9)
            tf = flops / dt / 1e12
            results[c].append(tf)
            print(f"[q8] r{r} bm{c[0]} bn{c[1]} bk{c[2]}: {dt*1e3:.3f} ms -> {tf:.1f} TFLOP/s",
                  flush=True)
    print("[q8] === medians ===", flush=True)
    for c, tfs in results.items():
        tfs.sort()
        print(f"[q8] {c}: {tfs[len(tfs)//2]:.1f} TFLOP/s (all {[round(x) for x in tfs]})",
              flush=True)


if __name__ == "__main__":
    main()
