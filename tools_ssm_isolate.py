"""Isolate the selective-scan cost inside the Mamba train step on TPU:
ssm_apply fwd and fwd+bwd alone (chunk=128 vs naive), vs the whole-step
cost, at the bench shape (d512 di1024 N16 B4 L1024).  Decides whether a
Pallas sequential-scan kernel is worth building.

    python tools_ssm_isolate.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kfunca_tpu.models.mamba import ssm_apply

B, L, DI, N = 4, 1024, 1024, 16
rng = np.random.RandomState(0)
hidden = jnp.asarray(rng.normal(size=(B, L, DI)) * 0.1, jnp.bfloat16)
dt = jnp.asarray(rng.uniform(0.001, 0.1, (B, L, DI)), jnp.float32)
Bm = jnp.asarray(rng.normal(size=(B, L, N)), jnp.float32)
C = jnp.asarray(rng.normal(size=(B, L, N)), jnp.float32)
A = -jnp.exp(jnp.asarray(rng.uniform(0, 1, (DI, N)), jnp.float32))
D = jnp.ones((DI,), jnp.float32)


def chain(fn, k):
    @jax.jit
    def run(hidden, dt, Bm, C):
        h, d = hidden, dt

        def body(i, carry):
            h, d = carry
            y = fn(h, d)
            # data-dependent, non-reassociable feedback (verify-skill rule)
            bump = (y[0, 0, 0] * jnp.float32(1e-9)).astype(h.dtype)
            h = jnp.maximum(h, bump)
            d = jnp.maximum(d, y[0, 0, :1] * 1e-12)
            return h, d

        h, d = jax.lax.fori_loop(0, k, body, (h, d))
        return h[0, 0, :1] + d[0, 0, :1].astype(h.dtype)

    return lambda: jax.device_get(run(hidden, dt, Bm, C))


def slope(fn_of, label):
    fns = {k: chain(fn_of, k) for k in (2, 8)}
    for k in (2, 8):
        fns[k]()  # warm
    per = []
    for _ in range(3):
        t2 = time.perf_counter(); fns[2](); t2 = time.perf_counter() - t2
        t8 = time.perf_counter(); fns[8](); t8 = time.perf_counter() - t8
        per.append((t8 - t2) / 6.0)
    print(f"{label}: {np.median(per)*1e3:.2f} ms (runs "
          f"{[round(p*1e3,2) for p in per]})", flush=True)


def fwd_chunk(h, d):
    return ssm_apply(h, d, Bm, C, A, D, 128)


def fwd_naive(h, d):
    return ssm_apply(h, d, Bm, C, A, D, None)


def make_bwd(chunk):
    def f(h, d):
        def loss(h_, d_):
            return jnp.sum(ssm_apply(h_, d_, Bm, C, A, D, chunk)
                           .astype(jnp.float32) ** 2) * 1e-6
        l, (gh, gd) = jax.value_and_grad(loss, argnums=(0, 1))(h, d)
        # consume every output
        return gh + l.astype(gh.dtype) + gd[..., :DI].astype(gh.dtype)
    return f


slope(fwd_chunk, "ssm fwd chunk128")
slope(fwd_naive, "ssm fwd naive")
slope(make_bwd(128), "ssm fwd+bwd chunk128")
slope(make_bwd(None), "ssm fwd+bwd naive")
# HBM-bound floor: read dt (fp32) + hidden (bf16) + write y (fp32) ~
bytes_min = B * L * DI * (4 + 2 + 4)
print(f"HBM floor ~ {bytes_min/1e6:.0f} MB -> "
      f"{bytes_min/8.1e11*1e3:.2f} ms at 810 GB/s", flush=True)


def fwd_pallas(h, d):
    return ssm_apply(h, d, Bm, C, A, D, None, engine="pallas")


slope(fwd_pallas, "ssm fwd PALLAS")


def make_bwd_pallas():
    def f(h, d):
        def loss(h_, d_):
            return jnp.sum(ssm_apply(h_, d_, Bm, C, A, D, None,
                                     engine="pallas")
                           .astype(jnp.float32) ** 2) * 1e-6
        l, (gh, gd) = jax.value_and_grad(loss, argnums=(0, 1))(h, d)
        return gh + l.astype(gh.dtype) + gd[..., :DI].astype(gh.dtype)
    return f


slope(make_bwd_pallas(), "ssm fwd+bwd PALLAS")
