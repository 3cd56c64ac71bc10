"""int8 MXU ceiling probe (round 3): is >=355 TFLOP/s (90% of the nominal
394 2x-rate roofline) reachable at ANY shape with XLA's own int8 dot?
Interleaved rounds, maximum()-bump chains, every output consumed."""
import time, sys
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

def sync(x):
    jax.device_get(jnp.ravel(x)[:1])

def timed(f, iters=5):
    sync(f())
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter(); sync(f()); best = min(best, time.perf_counter()-t0)
    return best

def mk_int8(m, k, n, K):
    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
    b = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
    @jax.jit
    def f(x, y):
        out = None
        for _ in range(K):
            out = jax.lax.dot(x, y, preferred_element_type=jnp.int32)
            bump = (out[0, 0] > jnp.int32(2**30)).astype(jnp.int8)
            x = jnp.maximum(x, bump + jnp.int8(-128))
        return out
    return lambda: f(a, b)

def mk_bf16(m, k, n, K):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)
    @jax.jit
    def f(x, y):
        out = None
        for _ in range(K):
            out = jax.lax.dot(x, y, preferred_element_type=jnp.float32)
            bump = (out[0, 0] > jnp.float32(3e38)).astype(jnp.bfloat16)
            x = jnp.maximum(x, bump + jnp.bfloat16(-3e38))
        return out
    return lambda: f(a, b)

VARIANTS = [
    ("i8_4k",  mk_int8, (4096, 4096, 4096)),
    ("i8_8k4k", mk_int8, (8192, 4096, 8192)),
    ("i8_8k",  mk_int8, (8192, 8192, 8192)),
    ("bf16_4k", mk_bf16, (4096, 4096, 4096)),
]

if __name__ == "__main__":
    K1, K2 = 4, 12
    fns = {}
    for name, mk, (m, k, n) in VARIANTS:
        fns[name] = (mk(m, k, n, K1), mk(m, k, n, K2), 2*m*k*n)
    res = {name: [] for name, *_ in VARIANTS}
    for r in range(5):
        for name, *_ in VARIANTS:
            f1, f2, fl = fns[name]
            t1, t2 = timed(f1), timed(f2)
            dt = max((t2-t1)/(K2-K1), 1e-9)
            res[name].append(fl/dt/1e12)
            print(f"[q8c] r{r} {name}: {dt*1e3:.3f} ms -> {fl/dt/1e12:.1f} TFLOP/s", flush=True)
    print("=== medians ===")
    for name, v in res.items():
        v.sort()
        print(f"{name}: {v[len(v)//2]:.1f} TFLOP/s  (all {[round(x) for x in v]})")
