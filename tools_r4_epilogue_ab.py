"""Round-4 item 7: do fused Pallas epilogues beat XLA's dot+fusion on the
MLP shapes of bench_train_mfu?  (L12 d1024 ff4096 B8 S2048 -> per-layer
matmuls (16384,1024)@(1024,4096) with SiLU, and (16384,4096)@(4096,1024)
with residual add.)

Arms, interleaved:
  up-xla       jit(silu(x @ wg))                    XLA fuses the activation
  up-pallas    matmul(x, wg, epilogue="silu")       fused on the accumulator
  down-xla     jit(h @ wd + res)
  down-pallas  matmul(h, wd, residual=res, epilogue="res")
Chained with maximum() bumps (additive bumps fold through dots).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

from kfunca_tpu.ops.pallas_kernels.matmul import matmul  # noqa: E402


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


def arms(m=16384, d=1024, f=4096, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (m, d), dtype)
    wg = jax.random.normal(key, (d, f), dtype) * 0.02
    wd = jax.random.normal(key, (f, d), dtype) * 0.02
    h0 = jax.random.normal(key, (m, f), dtype)
    res = jax.random.normal(key, (m, d), dtype)

    def feed(x, out):  # un-collapsible dependency: maximum vs tiny scalar
        return jnp.maximum(x, out[0, 0] * jnp.bfloat16(1e-30) - jnp.bfloat16(3e4))

    def up_xla(K):
        @jax.jit
        def fn(x, w):
            out = None
            for _ in range(K):
                out = jax.nn.silu(
                    jnp.dot(x, w, preferred_element_type=jnp.float32)
                ).astype(x.dtype)
                x = feed(x, out)
            return out
        return lambda: fn(x, wg)

    def up_pl(K):
        @jax.jit
        def fn(x, w):
            out = None
            for _ in range(K):
                out = matmul(x, w, epilogue="silu", bm=2048, bn=512, bk=1024)
                x = feed(x, out)
            return out
        return lambda: fn(x, wg)

    def down_xla(K):
        @jax.jit
        def fn(h, w, r):
            out = None
            for _ in range(K):
                out = (jnp.dot(h, w, preferred_element_type=jnp.float32)
                       + r.astype(jnp.float32)).astype(h.dtype)
                h = feed(h, out)
            return out
        return lambda: fn(h0, wd, res)

    def down_pl(K):
        @jax.jit
        def fn(h, w, r):
            out = None
            for _ in range(K):
                out = matmul(h, w, residual=r, epilogue="res",
                             bm=2048, bn=512, bk=1024)
                h = feed(h, out)
            return out
        return lambda: fn(h0, wd, res)

    fl_up = 2.0 * m * d * f
    fl_dn = 2.0 * m * f * d
    return [("up-xla", up_xla, fl_up), ("up-pallas", up_pl, fl_up),
            ("down-xla", down_xla, fl_dn), ("down-pallas", down_pl, fl_dn)]


if __name__ == "__main__":
    lst = arms()
    acc = {name: [] for name, _, _ in lst}
    for rnd in range(3):
        for name, mk, fl in lst:
            dt = slope(mk, 4, 20)
            acc[name].append(dt)
            print(f"[r{rnd}] {name:12s}: {dt*1e3:.3f} ms = "
                  f"{fl/dt/1e12:.1f} TFLOP/s", flush=True)
    print("--- medians ---")
    for name, mk, fl in lst:
        med = sorted(acc[name])[1]
        print(f"{name:12s}: {med*1e3:.3f} ms = {fl/med/1e12:.1f} TFLOP/s")
