"""int8 MXU ceiling probe (round 3): is >=355 TFLOP/s (90% of the nominal
394 2x-rate roofline) reachable at ANY shape with XLA's own int8 dot?

Uses bench.py's slope_time harness (median of slope reps, wide K
separation — the first cut used K2-K1=8 iterations, far below the relay
noise floor, and produced garbage).  Chains use the maximum()-bump
dependency and consume every output (see BENCH discipline in
.claude/skills/verify/SKILL.md).  bf16 variant included as a sanity
anchor (expect ~190-200 TFLOP/s)."""
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

from bench import slope_time, _log  # noqa: E402


def mk_int8(m, k, n):
    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
    b = jax.random.randint(key, (k, n), -127, 127, jnp.int8)

    def chain(K):
        @jax.jit
        def f(x, y):
            out = None
            for _ in range(K):
                out = jax.lax.dot(x, y, preferred_element_type=jnp.int32)
                bump = (out[0, 0] > jnp.int32(2**30)).astype(jnp.int8)
                x = jnp.maximum(x, bump + jnp.int8(-128))
            return out
        return lambda: f(a, b)

    return chain


def mk_bf16(m, k, n):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)

    def chain(K):
        @jax.jit
        def f(x, y):
            out = None
            for _ in range(K):
                out = jax.lax.dot(x, y, preferred_element_type=jnp.float32)
                bump = (out[0, 0] > jnp.float32(3e38)).astype(jnp.bfloat16)
                x = jnp.maximum(x, bump + jnp.bfloat16(-3e38))
            return out
        return lambda: f(a, b)

    return chain


VARIANTS = [
    ("i8_4k^3", mk_int8, (4096, 4096, 4096)),
    ("i8_8k_4k_8k", mk_int8, (8192, 4096, 8192)),
    ("i8_8k^3", mk_int8, (8192, 8192, 8192)),
    ("i8_4k_16k_4k", mk_int8, (4096, 16384, 4096)),
    ("bf16_4k^3", mk_bf16, (4096, 4096, 4096)),
]

if __name__ == "__main__":
    results = {}
    for name, mk, (m, k, n) in VARIANTS:
        dt = slope_time(mk(m, k, n), k1=8, k2=56, iters=5, label=name, reps=3)
        tflops = 2 * m * k * n / dt / 1e12
        results[name] = tflops
        _log(f"RESULT {name}: {dt*1e3:.3f} ms/iter -> {tflops:.1f} TFLOP/s")
    print("=== q8 ceiling probe ===")
    for name, t in results.items():
        print(f"{name}: {t:.1f} TFLOP/s")
