"""Round-4 items 6+8 measurements.

topk: is lax.top_k safe and faster than full-sort-narrow for
256 < k <= 2048 on v5e?  (The XLA TopkEmitter SIGABRTs at k=2049; the
dispatcher currently falls back to full sort for ALL k > 256.)  Arms
interleaved at k in {512, 1024, 2048} on (64, 65536) f32.

welford: round-4 raw-moments rework (no per-element mask) vs XLA two-pass
on the 16387^2 norm_stat shape.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")


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


def topk_ab():
    b, n = 64, 65536
    x0 = jax.random.normal(jax.random.PRNGKey(0), (b, n), jnp.float32)

    def feed(x, vals):
        return jnp.maximum(x, vals[0, 0] * jnp.float32(1e-30) - jnp.float32(3e38))

    def via_topk(k):
        def mk(K):
            @jax.jit
            def f(x):
                vals = None
                for _ in range(K):
                    vals, idx = lax.top_k(x, k)
                    x = feed(x, vals + idx[0, 0].astype(jnp.float32) * 0)
                return vals
            return lambda: f(x0)
        return mk

    def via_sort(k):
        def mk(K):
            @jax.jit
            def f(x):
                vals = None
                for _ in range(K):
                    iota = lax.broadcasted_iota(jnp.int32, x.shape, 1)
                    _, sv, si = lax.sort((-x, x, iota), dimension=1,
                                         is_stable=True, num_keys=1)
                    vals = lax.slice_in_dim(sv, 0, k, axis=1)
                    idx = lax.slice_in_dim(si, 0, k, axis=1)
                    x = feed(x, vals + idx[0, 0].astype(jnp.float32) * 0)
                return vals
            return lambda: f(x0)
        return mk

    for k in (512, 1024, 2048):
        arms = [("top_k", via_topk(k)), ("sort+narrow", via_sort(k))]
        acc = {nm: [] for nm, _ in arms}
        for rnd in range(3):
            for nm, mk in arms:
                try:
                    dt = slope(mk, 4, 16)
                except Exception as e:
                    print(f"[topk k={k}] {nm} FAILED: {type(e).__name__} {e}",
                          flush=True)
                    acc[nm].append(float("inf"))
                    continue
                acc[nm].append(dt)
                print(f"[topk k={k} r{rnd}] {nm}: {dt*1e3:.3f} ms", flush=True)
        for nm, _ in arms:
            med = sorted(acc[nm])[1]
            print(f"[topk k={k} MED] {nm}: {med*1e3:.3f} ms", flush=True)


def welford_ab():
    from kfunca_tpu.ops.pallas_kernels.welford import welford_norm_stat

    B = jax.random.normal(jax.random.PRNGKey(5), (16387, 16387), jnp.float32)

    def chain(engine):
        def mk(K):
            @jax.jit
            def f(x):
                inv = None
                for _ in range(K):
                    if engine == "pallas":
                        m_, inv = welford_norm_stat(x)
                    else:
                        m_ = jnp.mean(x, axis=0, keepdims=True)
                        var = jnp.mean((x - m_) * (x - m_), axis=0, keepdims=True)
                        inv = 1.0 / jnp.sqrt(var + 1e-12)
                    x = x.at[0:1, :].set(jnp.maximum(
                        x[0:1, :], inv - jnp.float32(3e38)))
                return inv
            return lambda: f(B)
        return mk

    # correctness probe first
    m_p, inv_p = welford_norm_stat(B[:1024, :1024])
    m_x = jnp.mean(B[:1024, :1024], axis=0, keepdims=True)
    v_x = jnp.mean((B[:1024, :1024] - m_x) ** 2, axis=0, keepdims=True)
    inv_x = 1.0 / jnp.sqrt(v_x + 1e-12)
    print("welford parity:",
          float(jnp.abs(m_p - m_x).max()), float(jnp.abs(inv_p - inv_x).max()),
          flush=True)

    arms = [("pallas", chain("pallas")), ("xla", chain("xla"))]
    acc = {nm: [] for nm, _ in arms}
    for rnd in range(3):
        for nm, mk in arms:
            dt = slope(mk, 2, 8)
            acc[nm].append(dt)
            print(f"[welford r{rnd}] {nm}: {dt*1e3:.3f} ms", flush=True)
    for nm, _ in arms:
        med = sorted(acc[nm])[1]
        print(f"[welford MED] {nm}: {med*1e3:.3f} ms", flush=True)
    print(f"HBM floor (1.07GB @819GB/s): {16387*16387*4/819e9*1e3:.3f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("topk", "all"):
        topk_ab()
    if which in ("welford", "all"):
        welford_ab()
