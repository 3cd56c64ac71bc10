"""A/B the round-3 fused-stats backward (in-kernel delta + raw exp2 stats
residual + frozen o/lse DMA) against the HEAD kernel (XLA delta pass +
lane-broadcast lse), interleaved in one process.

_flash_old.py is `git show HEAD:...flash_attention.py` (not committed).
Arms: old | new-compat (natural lse in, in-kernel delta) | new-raw.
"""

import sys

import jax

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kfunca_tpu.ops.pallas_kernels import _flash_old as old  # noqa: E402
from kfunca_tpu.ops.pallas_kernels import flash_attention as new  # noqa: E402


def main(b=4, h=16, s=2048, d=128, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (b, h, s, d), dtype)
    k = jax.random.normal(key, (b, h, s, d), dtype)
    v = jax.random.normal(key, (b, h, s, d), dtype)
    g = jax.random.normal(key, (b, h, s, d), dtype)
    bwd_blocks = dict(bq=1024, bk=1024)  # production tuned tiles (r3 sweep)

    def mk(mod, raw):
        def chain(K):
            @jax.jit
            def f(x, kk, vv, gg):
                for _ in range(K):
                    if raw:
                        out, st = mod.flash_attention_fwd_stats(
                            x, kk, vv, raw_stats=True)
                        dq, dk, dv = mod.flash_attention_backward(
                            x, kk, vv, gg, out=out, stats128=st, **bwd_blocks)
                    else:
                        out, lse = mod.flash_attention_fwd_stats(x, kk, vv)
                        dq, dk, dv = mod.flash_attention_backward(
                            x, kk, vv, gg, out=out, lse=lse, **bwd_blocks)
                    bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0])
                            > jnp.float32(1e30)).astype(x.dtype)
                    x = dq + bump
                return x
            return lambda: f(q, k, v, g)
        return chain

    arms = {"old": mk(old, False), "new_compat": mk(new, False),
            "new_raw": mk(new, True)}
    # numerics cross-check before timing
    ro = arms["old"](1)()
    rn = arms["new_raw"](1)()
    diff = float(jnp.max(jnp.abs(ro.astype(jnp.float32) - rn.astype(jnp.float32))))
    bench._log(f"old-vs-new dq maxdiff: {diff:.2e}")
    assert diff < 2e-2, diff

    t1s = {n: [] for n in arms}
    t2s = {n: [] for n in arms}
    K1, K2 = 2, 8
    for name, ch in arms.items():  # warm compiles
        for K in (K1, K2):
            bench._sync(ch(K)())
    for r in range(3):
        for name, ch in arms.items():
            t1s[name].append(bench._timed(ch(K1), iters=4))
            t2s[name].append(bench._timed(ch(K2), iters=4))
            bench._log(f"round {r} {name}: K{K1} {t1s[name][-1]*1e3:.1f} ms, "
                       f"K{K2} {t2s[name][-1]*1e3:.1f} ms")
    flops = 0.5 * 4 * b * h * s * s * d * 3.5
    for name in arms:
        dt = max((min(t2s[name]) - min(t1s[name])) / (K2 - K1), 1e-9)
        bench._log(f"RESULT {name}: {dt*1e3:.3f} ms fwd+bwd, "
                   f"{flops/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
