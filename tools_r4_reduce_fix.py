"""Round-4 item 3: the sum-xla arm of bench_reduce_engines measured 0.0
ms/iter — physically impossible (64 MB read ~= 80 us at HBM speed), so the
anti-collapse dependency fails for the XLA arm.  Try candidate dependency
structures, interleaved, and find one where BOTH engines show plausible
nonzero slopes.

Variants (chain: r = sum(x, axis=0); x' = dep(x, r)):
  v-row0     x.at[0:1].set(max(x[0:1], r-3e38))       (current, measured 0.0)
  v-rot      rotating row index per unrolled iteration
  v-replace  x.at[0:1].set(r * 1e-30)                  (真 data replacement)
  v-bcast    x = max(x, r - 3e38) broadcast over all rows (costs extra pass)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

from kfunca_tpu.ops.pallas_kernels.reduce import reduce_2d  # noqa: E402


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def slope(make_chain, k1, k2, reps=3):
    f1, f2 = make_chain(k1), make_chain(k2)
    for f in (f1, f2):
        sync(f())
    best = {}
    for kk, f in ((k1, f1), (k2, f2)):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f())
            ts.append(time.perf_counter() - t0)
        best[kk] = min(ts)
    return (best[k2] - best[k1]) / (k2 - k1)


A = jax.random.normal(jax.random.PRNGKey(5), (4096, 4096), jnp.float32)


def mk(engine, variant, K):
    @jax.jit
    def f(x):
        r = None
        for i in range(K):
            if engine == "pallas":
                r = reduce_2d(x, op="sum", out_dt=jnp.float32)
            else:
                r = jnp.sum(x, axis=0, keepdims=True)
            if variant == "row0":
                x = x.at[0:1, :].set(jnp.maximum(x[0:1, :], r - jnp.float32(3e38)))
            elif variant == "rot":
                j = i % 4096
                x = x.at[j:j + 1, :].set(
                    jnp.maximum(x[j:j + 1, :], r - jnp.float32(3e38)))
            elif variant == "replace":
                x = x.at[0:1, :].set(r * jnp.float32(1e-30))
            elif variant == "bcast":
                x = jnp.maximum(x, r - jnp.float32(3e38))
        return r
    return lambda: f(A)


if __name__ == "__main__":
    hbm_floor_ms = 4096 * 4096 * 4 / 819e9 * 1e3  # one full read
    print(f"HBM floor (one 64MB read @819GB/s): {hbm_floor_ms:.4f} ms")
    variants = ["row0", "rot", "replace", "bcast"]
    arms = [(v, e) for v in variants for e in ("xla", "pallas")]
    acc = {a: [] for a in arms}
    for rnd in range(3):
        for v, e in arms:
            dt = slope(lambda K, v=v, e=e: mk(e, v, K), 8, 40)
            acc[(v, e)].append(dt)
            print(f"[r{rnd}] {v:8s} {e:6s}: {dt*1e3:.4f} ms/iter", flush=True)
    print("--- medians ---")
    for v, e in arms:
        m = sorted(acc[(v, e)])[1]
        flag = " COLLAPSED" if m * 1e3 < hbm_floor_ms * 0.5 else ""
        print(f"{v:8s} {e:6s}: {m*1e3:.4f} ms/iter{flag}")
