"""One-shot TPU sort benchmark with chained slope timing (the relay adds
~25 ms RTT per dispatch, so single-call timing only measures the tunnel)."""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax

from kfunca_tpu.ops.pallas_kernels.bitonic_sort import bitonic_sort_pairs


def chain_pallas(K):
    @jax.jit
    def f(x):
        for _ in range(K):
            v, i = bitonic_sort_pairs(x)
            x = v + jnp.float32(1e-7)  # dependency, preserves shape
        return x
    return f


def chain_lax(K):
    @jax.jit
    def f(x):
        for _ in range(K):
            iota = lax.broadcasted_iota(jnp.int32, x.shape, 1)
            _, v, i = lax.sort((x, x, iota), dimension=1, is_stable=True, num_keys=1)
            x = v + jnp.float32(1e-7)
        return f and x
    return f


def slope(mk, x, k1=2, k2=8, iters=4):
    def timed(fn):
        np.asarray(jax.device_get(jnp.ravel(fn(x))[:1]))
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(jnp.ravel(fn(x))[:1]))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(mk(k2)) - timed(mk(k1))) / (k2 - k1)


key = jax.random.PRNGKey(0)
for rows, n in [(845, 1024), (8192, 512)]:
    x = jax.random.normal(key, (rows, n), jnp.float32)
    tp = slope(chain_pallas, x)
    tl = slope(chain_lax, x)
    melem = rows * n / 1e6
    print(
        f"({rows},{n}): pallas {tp*1e3:.2f} ms ({melem/tp:.0f} Melem/s) "
        f"vs lax.sort {tl*1e3:.2f} ms ({melem/tl:.0f} Melem/s) -> {tl/tp:.1f}x",
        flush=True,
    )
print("DONE", flush=True)
