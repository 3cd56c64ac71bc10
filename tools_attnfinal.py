"""Final attention benchmark: ours vs the stock jax pallas kernel, median-of-3
slope harness (the min-of-2 used in earlier sweeps was noise-prone)."""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1]))


def _timed(fn, iters=6):
    _sync(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_chain, k1, k2, label):
    f1, f2 = make_chain(k1), make_chain(k2)
    slopes = []
    for r in range(3):
        t1, t2 = _timed(f1), _timed(f2)
        slopes.append(max((t2 - t1) / (k2 - k1), 1e-9))
        print(f"  {label}[{r}]: {slopes[-1]*1e3:.3f} ms/iter", flush=True)
    slopes.sort()
    return slopes[1]


def main():
    from kfunca_tpu.ops.pallas_kernels import flash_attention as fa
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention as jax_fa,
    )

    b, h, s, d = 4, 16, 2048, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    g = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    cf = 0.5 * 4 * b * h * s * s * d

    for bq, bk in [(2048, 2048), (1024, 1024)]:
        def chain(K, bq=bq, bk=bk):
            @jax.jit
            def f(x, kk, vv):
                for _ in range(K):
                    x = fa.flash_attention_fwd_stats(x, kk, vv, bq=bq, bk=bk, save_stats=False)[0]
                return x
            return lambda: f(q, k, v)
        dt = slope(chain, 4, 16, f"ours-fwd {bq}x{bk}")
        print(f"OURS FWD {bq}x{bk}: {dt*1e3:.3f} ms = {cf/dt/1e12:.1f} TFLOP/s", flush=True)

        def chainb(K, bq=bq, bk=bk):
            @jax.jit
            def f(x, kk, vv, gg):
                for _ in range(K):
                    out, lse = fa.flash_attention_fwd_stats(x, kk, vv, bq=bq, bk=bk)
                    dq, dk, dv = fa.flash_attention_backward(x, kk, vv, gg, out=out, lse=lse, bq=bq, bk=bk)
                    x = dq
                return x
            return lambda: f(q, k, v, g)
        dt = slope(chainb, 2, 8, f"ours-fb {bq}x{bk}")
        print(f"OURS FWD+BWD {bq}x{bk}: {dt*1e3:.3f} ms = {cf*3.5/dt/1e12:.1f} TFLOP/s", flush=True)

    bs = BlockSizes(block_q=512, block_k_major=512, block_k=512, block_b=1,
                    block_q_major_dkv=512, block_k_major_dkv=512, block_k_dkv=512, block_q_dkv=512,
                    block_k_major_dq=512, block_k_dq=512, block_q_dq=512)
    def chain(K):
        @jax.jit
        def f(x, kk, vv):
            for _ in range(K):
                x = jax_fa(x, kk, vv, causal=True, sm_scale=1.0/(d**0.5), block_sizes=bs)
            return x
        return lambda: f(q, k, v)
    dt = slope(chain, 4, 16, "jaxfa-fwd 512")
    print(f"JAXFA FWD 512: {dt*1e3:.3f} ms = {cf/dt/1e12:.1f} TFLOP/s", flush=True)

    def chainb(K):
        @jax.jit
        def f(x, kk, vv, gg):
            for _ in range(K):
                out, vjp = jax.vjp(lambda a, b2, c: jax_fa(a, b2, c, causal=True, sm_scale=1.0/(d**0.5), block_sizes=bs), x, kk, vv)
                dq, dk, dv = vjp(gg)
                x = dq
            return x
        return lambda: f(q, k, v, g)
    dt = slope(chainb, 2, 8, "jaxfa-fb 512")
    print(f"JAXFA FWD+BWD 512: {dt*1e3:.3f} ms = {cf*3.5/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
