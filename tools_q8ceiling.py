"""int8 MXU ceiling probe (round 3): is >=355 TFLOP/s (90% of the nominal
394 2x-rate roofline) reachable at ANY shape with XLA's own int8 dot?

Uses bench.py's slope_time harness (median of slope reps, wide K
separation — the first cut used K2-K1=8 iterations, far below the relay
noise floor, and produced garbage).  Chains use the maximum()-bump
dependency and consume every output (see BENCH discipline in
.claude/skills/verify/SKILL.md).  bf16 variant included as a sanity
anchor (expect ~190-200 TFLOP/s).

Post-mortem of two broken cuts: (1) K2-K1=8 iterations is below the relay
noise floor; (2) a scalar bump from out[0,0] lets XLA SLICE every
intermediate dot to one output element — the "1970 TFLOP/s bf16" artifact
was exactly the HBM read cost of one operand.  The fix: consume out
ELEMENTWISE as the next operand (fused into the dot epilogue); a full
max-reduce bump is honest but pays a serialized VPU pass per iteration
(bf16 anchor measured 138 vs ~190 TFLOP/s)."""
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
                # consume out ELEMENTWISE as the next operand: full
                # dependence (unsliceable) fused into the dot epilogue —
                # a max-reduce bump costs a serialized VPU pass (MXU and
                # VPU serialize on this chip; the bf16 anchor read 138
                # instead of ~190 TFLOP/s with the reduce epilogue)
                x = (jnp.bitwise_and(out, 127) - 64).astype(jnp.int8)
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
                x = jnp.clip(out * jnp.float32(1e-3), -3.0, 3.0).astype(jnp.bfloat16)
            return out
        return lambda: f(a, b)

    return chain


# elementwise feeding needs k == n (out (m,n) becomes the next x (m,k))
VARIANTS = [
    ("i8_4k^3", mk_int8, (4096, 4096, 4096)),
    ("i8_16k_4k_4k", mk_int8, (16384, 4096, 4096)),
    ("i8_4k_8k_8k", mk_int8, (4096, 8192, 8192)),
    ("i8_8k^3", mk_int8, (8192, 8192, 8192)),
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
