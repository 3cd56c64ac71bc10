"""Attention kernel tile sweep on real TPU (b4 h16 s2048 d128 bf16 causal).

Usage: python tools_attnbench.py [fwd|bwd|both]
"""

import os
import sys
import time

import jax

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(jnp.ravel(leaves[0])[:1]))


def _timed(fn, iters=4):
    _sync(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_chain, k1, k2, label):
    f1, f2 = make_chain(k1), make_chain(k2)
    best = float("inf")
    for r in range(2):
        t1, t2 = _timed(f1), _timed(f2)
        dt = max((t2 - t1) / (k2 - k1), 1e-9)
        print(f"  {label}[{r}]: {dt*1e3:.3f} ms/iter", flush=True)
        best = min(best, dt)
    return best


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    from kfunca_tpu.ops.pallas_kernels import flash_attention as fa

    b, h, s, d = 4, 16, 2048, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    g = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    causal_flops = 0.5 * 4 * b * h * s * s * d

    # correctness spot-check vs XLA oracle (bf16 tolerance)
    def oracle(q, k, v):
        qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
        sc = jnp.einsum("bhtd,bhld->bhtl", qf, kf) / (d ** 0.5)
        mask = jnp.tril(jnp.ones((s, s), bool))
        sc = jnp.where(mask, sc, -1e30)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum("bhtl,bhld->bhtd", p, vf)

    ref = jax.jit(oracle)(q[:1, :2], k[:1, :2], v[:1, :2])
    got = fa.flash_attention_fwd_stats(q[:1, :2], k[:1, :2], v[:1, :2], bq=512, bk=512)[0]
    err = float(jnp.max(jnp.abs(ref - got.astype(jnp.float32))))
    print(f"fwd maxdiff vs oracle: {err:.5f}", flush=True)
    assert err < 0.05, err

    configs = [(512, 512), (256, 256), (1024, 1024), (512, 1024), (1024, 512), (2048, 2048)]
    if which in ("fwd", "both"):
        for bq, bk in configs:
            def chain(K, bq=bq, bk=bk):
                @jax.jit
                def f(x, kk, vv):
                    for _ in range(K):
                        x = fa.flash_attention_fwd_stats(x, kk, vv, bq=bq, bk=bk)[0]
                    return x
                return lambda: f(q, k, v)
            dt = slope(chain, 4, 16, f"fwd bq={bq} bk={bk}")
            print(f"FWD bq={bq} bk={bk}: {dt*1e3:.3f} ms = {causal_flops/dt/1e12:.1f} TFLOP/s", flush=True)

    if which in ("bwd", "both"):
        for bq, bk in configs:
            def chain(K, bq=bq, bk=bk):
                @jax.jit
                def f(x, kk, vv, gg):
                    for _ in range(K):
                        out, lse = fa.flash_attention_fwd_stats(x, kk, vv, bq=bq, bk=bk)
                        dq, dk, dv = fa.flash_attention_backward(
                            x, kk, vv, gg, out=out, lse=lse, bq=bq, bk=bk
                        )
                        x = dq
                    return x
                return lambda: f(q, k, v, g)
            dt = slope(chain, 2, 8, f"fwd+bwd bq={bq} bk={bk}")
            print(f"FWD+BWD bq={bq} bk={bk}: {dt*1e3:.3f} ms = {causal_flops*3.5/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
