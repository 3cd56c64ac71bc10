"""One-shot sort benchmark on the TPU (see /tmp/sortbench3.log)."""
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


def timed(fn, *a, iters=5):
    np.asarray(jax.device_get(jnp.ravel(fn(*a)[0])[:1]))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jnp.ravel(fn(*a)[0])[:1]))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def lax_sort(x):
    iota = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    _, v, i = lax.sort((x, x, iota), dimension=1, is_stable=True, num_keys=1)
    return v, i


key = jax.random.PRNGKey(0)
for rows, n in [(845, 1024), (8192, 512), (512, 128)]:
    x = jax.random.normal(key, (rows, n), jnp.float32)
    t0 = time.perf_counter()
    tb = timed(bitonic_sort_pairs, x)
    print(f"({rows},{n}) pallas ready in {time.perf_counter()-t0:.1f}s", flush=True)
    tl = timed(lax_sort, x)
    print(
        f"({rows},{n}): pallas {tb*1e3:.2f} ms vs lax.sort {tl*1e3:.2f} ms -> {tl/tb:.1f}x",
        flush=True,
    )
print("DONE", flush=True)
