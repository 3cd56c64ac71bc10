"""Round-4 item 1: reconcile the attention fwd+bwd numbers and A/B against
splash attention (the production JAX TPU kernel).

Arms, INTERLEAVED in one process (sequential runs drift +-10-30%):
  A  bench-style: jax.vjp(causal_attention_fn) — the production VJP path
     (raw-stats residuals + autotune-cache tiles).
  B  direct composition: fwd_stats(raw_stats=True) + backward(bq=512,bk=1024)
     — exactly what tools_attnbwd2.py swept to 2.45-2.50 ms.
  C  splash attention (make_splash_mha, CausalMask) fwd+bwd via jax.vjp.
Also fwd-only: A_fwd (ours) vs C_fwd (splash).

All chains use additive bumps on dk/dv so no kernel is DCE'd, and are
slope-timed (K2-K1) with median-of-reps.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

from kfunca_tpu.ops.attention import causal_attention_fn  # noqa: E402
from kfunca_tpu.ops.pallas_kernels import flash_attention as fa  # noqa: E402

from jax.experimental.pallas.ops.tpu.splash_attention import (  # noqa: E402
    splash_attention_kernel as sk,
    splash_attention_mask as sm,
)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def slope(make_chain, k1, k2, reps=4):
    f1, f2 = make_chain(k1), make_chain(k2)
    out = []
    for f in (f1, f2):
        sync(f())  # compile + warm
    ts = {k1: [], k2: []}
    for _ in range(reps):
        for kk, f in ((k1, f1), (k2, f2)):
            t0 = time.perf_counter()
            sync(f())
            ts[kk].append(time.perf_counter() - t0)
    return (min(ts[k2]) - min(ts[k1])) / (k2 - k1)


def make_splash(s, d, h, bq, bkv):
    mask = sm.MultiHeadMask([sm.CausalMask((s, s)) for _ in range(h)])
    bs = sk.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bkv,
        block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
        block_q_dq=bq, block_kv_dq=bkv,
    )
    return sk.make_splash_mha(
        mask=mask, head_shards=1, q_seq_shards=1, block_sizes=bs)


def arms(b, h, s, d, hkv=None, dtype=jnp.bfloat16, splash_blocks=(512, 1024)):
    hkv = hkv or h
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (b, h, s, d), dtype)
    k = jax.random.normal(key, (b, hkv, s, d), dtype)
    v = jax.random.normal(key, (b, hkv, s, d), dtype)
    g = jax.random.normal(key, (b, h, s, d), dtype)
    flops_fwd = 0.5 * 4 * b * h * s * s * d
    flops_fb = flops_fwd * 3.5

    def a_vjp(K):
        @jax.jit
        def f(x, kk, vv, gg):
            for _ in range(K):
                out, vjp = jax.vjp(causal_attention_fn, x, kk, vv)
                dq, dk, dv = vjp(gg)
                bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0])
                        > jnp.float32(1e30)).astype(x.dtype)
                x = dq + bump
            return x
        return lambda: f(q, k, v, g)

    def b_direct(K):
        @jax.jit
        def f(x, kk, vv, gg):
            for _ in range(K):
                out, st = fa.flash_attention_fwd_stats(x, kk, vv, raw_stats=True)
                dq, dk, dv = fa.flash_attention_backward(
                    x, kk, vv, gg, out=out, stats128=st, bq=512, bk=1024)
                bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0])
                        > jnp.float32(1e30)).astype(x.dtype)
                x = dq + bump
            return x
        return lambda: f(q, k, v, g)

    if hkv == h:
        splash = make_splash(s, d, h, *splash_blocks)

        def splash_call(x, kk, vv):
            # splash is per-batch (h, s, d) with vmap over batch
            return jax.vmap(splash)(x, kk, vv)
    else:
        # GQA via splash's MQA kernel: vmap over kv heads, each kv head
        # serving its group of h//hkv q heads
        bq_, bkv_ = splash_blocks
        mask = sm.MultiHeadMask(
            [sm.CausalMask((s, s)) for _ in range(h // hkv)])
        bs = sk.BlockSizes(
            block_q=bq_, block_kv=bkv_, block_kv_compute=bkv_,
            block_q_dkv=bq_, block_kv_dkv=bkv_, block_kv_dkv_compute=bkv_,
            block_q_dq=bq_, block_kv_dq=bkv_,
        )
        mqa = sk.make_splash_mqa_single_device(mask=mask, block_sizes=bs)

        def splash_call(x, kk, vv):
            bb = x.shape[0]
            xg = x.reshape(bb, hkv, h // hkv, s, d)
            out = jax.vmap(jax.vmap(mqa))(xg, kk, vv)
            return out.reshape(bb, h, s, d)

    def with_x64_off(thunk):
        # kfunca enables jax_enable_x64; splash's kernels trace f64
        # constants under it and Mosaic recurses to death converting them.
        # Trace/execute splash with x64 off (a trace-level toggle).
        def run():
            with jax.enable_x64(False):
                return thunk()
        return run

    def c_splash(K):
        @jax.jit
        def f(x, kk, vv, gg):
            for _ in range(K):
                out, vjp = jax.vjp(splash_call, x, kk, vv)
                dq, dk, dv = vjp(gg)
                bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0])
                        > jnp.float32(1e30)).astype(x.dtype)
                x = (dq + bump).astype(x.dtype)
            return x
        return with_x64_off(lambda: f(q, k, v, g))

    def a_fwd(K):
        @jax.jit
        def f(x, kk, vv):
            for _ in range(K):
                x = causal_attention_fn(x, kk, vv)
            return x
        return lambda: f(q, k, v)

    def c_fwd(K):
        @jax.jit
        def f(x, kk, vv):
            for _ in range(K):
                x = splash_call(x, kk, vv).astype(x.dtype)
            return x
        return with_x64_off(lambda: f(q, k, v))

    return {
        "fb": [("A-vjp-prod", a_vjp, flops_fb),
               ("B-direct-512x1024", b_direct, flops_fb),
               ("C-splash", c_splash, flops_fb)],
        "fwd": [("A-fwd-prod", a_fwd, flops_fwd),
                ("C-splash-fwd", c_fwd, flops_fwd)],
    }


def run(b, h, s, d, hkv=None, rounds=3, splash_blocks=(512, 1024)):
    built = arms(b, h, s, d, hkv=hkv, splash_blocks=splash_blocks)
    print(f"=== b{b} h{h} hkv{hkv or h} s{s} d{d} bf16 causal, splash blocks "
          f"{splash_blocks} ===", flush=True)
    for tier, lst in built.items():
        k1, k2 = (2, 10) if tier == "fb" else (4, 24)
        acc = {name: [] for name, _, _ in lst}
        for r in range(rounds):
            for name, mk, fl in lst:
                dt = slope(mk, k1, k2)
                acc[name].append(dt)
                print(f"  [{tier} r{r}] {name}: {dt*1e3:.3f} ms "
                      f"= {fl/dt/1e12:.1f} TFLOP/s", flush=True)
        for name, mk, fl in lst:
            med = sorted(acc[name])[len(acc[name]) // 2]
            print(f"  [{tier} MED] {name}: {med*1e3:.3f} ms "
                  f"= {fl/med/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    hkv = int(sys.argv[2]) if len(sys.argv) > 2 else None
    b = 1 if s >= 8192 else 4
    run(b, 16, s, 128, hkv=hkv)
