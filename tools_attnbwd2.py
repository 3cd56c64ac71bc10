"""Re-sweep fused-bwd tile rectangles AFTER the in-kernel-stats rework
(session-4: first-visit delta + raw exp2 residual + frozen o/lse DMA).

The shipped v5e autotune entries for attn_bwd were swept against the
pre-rework kernel; the rework changed the cost structure (frozen o/lse
DMAs fire nqb times per bh, the whole-sequence delta scratch is reused
across visits), so the 1024^2-at-s2048 winner needs re-validation.

Interleaved rounds, raw-stats path (the production composition), chained
with a maximum bump (DCE-proof), slope-timed K2-K1.
"""

import sys

import jax

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kfunca_tpu.ops.pallas_kernels import flash_attention as fa  # noqa: E402


def sweep(b, h, s, d, rects, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (b, h, s, d), dtype)
    k = jax.random.normal(key, (b, h, s, d), dtype)
    v = jax.random.normal(key, (b, h, s, d), dtype)
    g = jax.random.normal(key, (b, h, s, d), dtype)

    def mk(bq, bk):
        def chain(K):
            @jax.jit
            def f(x, kk, vv, gg):
                for _ in range(K):
                    out, st = fa.flash_attention_fwd_stats(
                        x, kk, vv, raw_stats=True)
                    dq, dk, dv = fa.flash_attention_backward(
                        x, kk, vv, gg, out=out, stats128=st, bq=bq, bk=bk)
                    bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0])
                            > jnp.float32(1e30)).astype(x.dtype)
                    # keep the chain in the input dtype: a fp32 scalar arm
                    # would weak-type-promote x and run fp32 attention
                    x = jnp.maximum(dq.astype(x.dtype),
                                    (jnp.float32(-1e30) + bump).astype(x.dtype))
                return x
            return lambda: f(q, k, v, g)
        return chain

    arms = {f"{bq}x{bk}": mk(bq, bk) for bq, bk in rects}
    K1, K2 = 2, 6
    for name, ch in arms.items():
        for K in (K1, K2):
            bench._sync(ch(K)())
    t1s = {n: [] for n in arms}
    t2s = {n: [] for n in arms}
    for r in range(3):
        for name, ch in arms.items():
            t1s[name].append(bench._timed(ch(K1), iters=3))
            t2s[name].append(bench._timed(ch(K2), iters=3))
            bench._log(f"s={s} round {r} {name}: K{K1} "
                       f"{t1s[name][-1]*1e3:.1f} ms, K{K2} "
                       f"{t2s[name][-1]*1e3:.1f} ms")
    flops = 0.5 * 4 * b * h * s * s * d * 3.5
    results = {}
    for name in arms:
        dt = max((min(t2s[name]) - min(t1s[name])) / (K2 - K1), 1e-9)
        results[name] = dt
        bench._log(f"RESULT s={s} {name}: {dt*1e3:.3f} ms fwd+bwd, "
                   f"{flops/dt/1e12:.1f} TFLOP/s")
    win = min(results, key=results.get)
    bench._log(f"WINNER s={s}: {win}")


def main():
    sweep(4, 16, 2048, 128,
          [(512, 512), (1024, 1024), (1024, 512), (512, 1024), (256, 512)])
    sweep(2, 8, 8192, 128, [(512, 512), (1024, 1024), (1024, 512)])


if __name__ == "__main__":
    main()
