"""r5: attribute the w8kv8 decode overhead OUTSIDE the attention kernel.

bench r5: w8 B8 = 11045 tok/s (0.72 ms/step) vs w8kv8 = 8502 (0.94 ms) while
the fused-DMA kernel itself is 107 us/step FASTER on int8 pools
(tools_r5_decode_probe) — so ~0.3 ms/step of int8-writer overhead hides in
the non-kernel step.  Time the writer alone: 8 layers of new-token KV
scatter into the fused stacked pools, bf16 vs int8(+scale scatter).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import slope_time  # noqa: E402
from kfunca_tpu.ops.quant import quantize_vecs  # noqa: E402

L, H, HD, PAGE = 8, 16, 64, 128
B, MAXP = 8, 8


def main():
    key = jax.random.PRNGKey(0)
    n_pages = B * MAXP + 1
    kv = jnp.zeros((L, n_pages, PAGE, 2 * H * HD), jnp.bfloat16)
    kv8 = jnp.zeros((L, n_pages, PAGE, 2 * H * HD), jnp.int8)
    sc = jnp.ones((L, n_pages, 2 * H, PAGE), jnp.float32)
    tables = jnp.asarray(np.stack([
        np.arange(i * MAXP, (i + 1) * MAXP, dtype=np.int32)
        for i in range(B)]))
    pos0 = jnp.full((B,), 960, jnp.int32)
    newk = jax.random.normal(key, (B, H, HD), jnp.bfloat16)
    newv = jax.random.normal(jax.random.PRNGKey(1), (B, H, HD), jnp.bfloat16)

    def mk_bf16(K):
        @jax.jit
        def f(pool, pos, k, v):
            def body(_, carry):
                pool, pos, k = carry
                ps = tables[jnp.arange(B), pos // PAGE]
                off = pos % PAGE
                kvnew = jnp.concatenate(
                    [k.reshape(B, -1), v.reshape(B, -1)], axis=-1)
                for li in range(L):
                    pool = pool.at[li, ps, off].set(
                        kvnew.astype(pool.dtype) + jnp.bfloat16(li))
                k = k + pool[0, 0, 0, 0].astype(k.dtype) * jnp.bfloat16(1e-9)
                return (pool, pos, k)
            pool, pos, k = lax.fori_loop(0, K, body, (pool, pos, k))
            return pool[0, 0, 0, 0]
        return lambda: f(kv, pos0, newk, newv)

    def mk_int8(K, with_scale=True):
        @jax.jit
        def f(pool, scp, pos, k, v):
            def body(_, carry):
                pool, scp, pos, k = carry
                ps = tables[jnp.arange(B), pos // PAGE]
                off = pos % PAGE
                qk, sk = quantize_vecs(k)
                qv, sv = quantize_vecs(v)
                kvnew = jnp.concatenate(
                    [qk.reshape(B, -1), qv.reshape(B, -1)], axis=-1)
                scnew = jnp.concatenate([sk, sv], axis=-1)
                for li in range(L):
                    pool = pool.at[li, ps, off].set(kvnew + jnp.int8(li))
                    if with_scale:
                        scp = scp.at[li, ps, :, off].set(
                            scnew + jnp.float32(li))
                k = k + pool[0, 0, 0, 0].astype(k.dtype) * jnp.bfloat16(1e-9)
                return (pool, scp, pos, k)
            pool, scp, pos, k = lax.fori_loop(0, K, body, (pool, scp, pos, k))
            return pool[0, 0, 0, 0].astype(jnp.float32) + scp[0, 0, 0, 0]
        return lambda: f(kv8, sc, pos0, newk, newv)

    def mk_int8_noscale(K):
        return mk_int8(K, with_scale=False)

    variants = [
        ("writer_bf16", mk_bf16),
        ("writer_int8+scale", mk_int8),
        ("writer_int8_only", mk_int8_noscale),
    ]
    res = {}
    for rnd in range(2):
        for name, mk in variants:
            dt = slope_time(mk, k1=4, k2=16, label=f"{name}[r{rnd}]", reps=1)
            res.setdefault(name, []).append(dt)
    print("\n=== r5 writer probe (per step, 8 layers) ===")
    for name, ds in res.items():
        print(f"{name:>20}: {min(ds)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
