"""Post-rework bwd tile sweep: the in-kernel-stats backward changes the
DMA economics (frozen o/lse, larger VMEM scratch), so re-sweep (bq, bk)
for fwd+bwd at the bench shape.  Interleaved, DCE-proofed chains."""

import sys

import jax

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kfunca_tpu.ops.pallas_kernels import flash_attention as fa  # noqa: E402


def main(b=4, h=16, s=2048, d=128, dtype=jnp.bfloat16):
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
                    out, st = fa.flash_attention_fwd_stats(x, kk, vv, raw_stats=True)
                    dq, dk, dv = fa.flash_attention_backward(
                        x, kk, vv, gg, out=out, stats128=st, bq=bq, bk=bk)
                    bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0])
                            > jnp.float32(1e30)).astype(x.dtype)
                    x = dq + bump
                return x
            return lambda: f(q, k, v, g)
        return chain

    arms = {f"{bq}x{bk}": mk(bq, bk)
            for bq, bk in ((512, 512), (512, 1024), (1024, 512),
                           (1024, 1024), (1024, 2048), (2048, 2048))}
    for name, ch in arms.items():
        for K in (2, 8):
            bench._sync(ch(K)())
    t1s = {n: [] for n in arms}
    t2s = {n: [] for n in arms}
    for r in range(3):
        for name, ch in arms.items():
            t1s[name].append(bench._timed(ch(2), iters=4))
            t2s[name].append(bench._timed(ch(8), iters=4))
    flops = 0.5 * 4 * b * h * s * s * d * 3.5
    for name in arms:
        dt = max((min(t2s[name]) - min(t1s[name])) / 6, 1e-9)
        bench._log(f"RESULT {name}: {dt*1e3:.3f} ms fwd+bwd, {flops/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
