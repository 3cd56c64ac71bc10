"""Round-4: isolate why w8kv8 decode regressed vs w8 under the stacked-pool
layout (tools_r4_decode_ab.py: B8 w8 1.225 ms/step vs w8kv8 2.166).

Variants (each a fori_loop chain, slope-timed, interleaved):
  scat_bf16  - 8 layers' worth of at[li, slot, off].set on bf16 stacked pools
  scat_int8  - same on int8 pools + fp32 scale pools (incl. quantize_vecs)
  kern_bf16  - 8 page_base kernel calls on the flat bf16 pools (no scatter)
  kern_int8  - same with int8 pools + scales
  both_int8  - scatter + kernel per layer (the production interaction)
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax import lax  # noqa: E402

from bench import slope_time  # noqa: E402
from kfunca_tpu.ops.pallas_kernels.paged_attention import (  # noqa: E402
    paged_decode_attention,
)
from kfunca_tpu.ops.quant import quantize_vecs  # noqa: E402

L, H, HD, PAGE = 8, 16, 64, 128
B, CTX, CAP = 8, 960, 1024
MAXP = CAP // PAGE


def main():
    key = jax.random.PRNGKey(0)
    n_pages = B * MAXP + 1
    pk = jax.random.normal(key, (L, n_pages, PAGE, H, HD), jnp.bfloat16)
    pv = jax.random.normal(key, (L, n_pages, PAGE, H, HD), jnp.bfloat16)
    qk = quantize_vecs(pk)  # ((L,n,p,H,hd) int8, (L,n,p,H) fp32)
    qv = quantize_vecs(pv)
    tables = np.zeros((B, MAXP), np.int32)
    for i in range(B):
        tables[i] = np.arange(i * MAXP, (i + 1) * MAXP, dtype=np.int32)
    tables = jnp.asarray(tables)
    pos0 = jnp.full((B,), CTX, jnp.int32)
    q0 = jax.random.normal(key, (B, H, HD), jnp.bfloat16) * 0.1

    flat = lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])

    def mk_scatter(quant):
        def mk(K):
            @jax.jit
            def f(pka, pva, pos):
                def body(i, carry):
                    pka, pva, pos = carry
                    slot = tables[jnp.arange(B), pos // PAGE]
                    off = pos % PAGE
                    newk = (jnp.full((B, H, HD), 1.0, jnp.float32)
                            * (i + 1).astype(jnp.float32))
                    for li in range(L):
                        if quant:
                            qn, sn = quantize_vecs(newk + li)
                            pka = (pka[0].at[li, slot, off].set(qn),
                                   pka[1].at[li, slot, off].set(sn))
                            pva = (pva[0].at[li, slot, off].set(qn),
                                   pva[1].at[li, slot, off].set(sn))
                        else:
                            nk = (newk + li).astype(jnp.bfloat16)
                            pka = pka.at[li, slot, off].set(nk)
                            pva = pva.at[li, slot, off].set(nk)
                    return (pka, pva, pos + 1)
                pka, pva, pos = lax.fori_loop(0, K, body, (pka, pva, pos))
                return pos + (pka[0] if quant else pka)[
                    0, 0, 0, 0, 0].astype(jnp.int32)
            src = (qk, qv) if quant else (pk, pv)
            return lambda: f(src[0], src[1], pos0)
        return mk

    def mk_kernel(quant):
        def mk(K):
            @jax.jit
            def f(pka, pva, pos, q):
                if quant:
                    fk, sk = flat(pka[0]), flat(pka[1])
                    fv, sv = flat(pva[0]), flat(pva[1])
                else:
                    fk, fv = flat(pka), flat(pva)

                def body(i, carry):
                    acc, q, pos = carry
                    qs = jnp.maximum(q, acc.astype(q.dtype) * jnp.bfloat16(
                        1e-9) - jnp.bfloat16(1e9))
                    for li in range(L):
                        kw = dict(page_base=li * n_pages)
                        if quant:
                            attn = paged_decode_attention(
                                qs, fk, fv, tables, pos,
                                scales=(sk, sv), **kw)
                        else:
                            attn = paged_decode_attention(
                                qs, fk, fv, tables, pos, **kw)
                        acc = acc + attn.astype(jnp.float32)
                    return (acc, q, pos)
                acc = jnp.zeros((B, H, HD), jnp.float32)
                acc, q, pos = lax.fori_loop(0, K, body, (acc, q, pos))
                return acc[0, 0, 0]
            src = (qk, qv) if quant else (pk, pv)
            return lambda: f(src[0], src[1], pos0, q0)
        return mk

    def mk_both():
        def mk(K):
            @jax.jit
            def f(pka, pva, pos, q):
                def body(i, carry):
                    pka, pva, acc, pos = carry
                    slot = tables[jnp.arange(B), pos // PAGE]
                    off = pos % PAGE
                    qs = jnp.maximum(q, acc.astype(q.dtype) * jnp.bfloat16(
                        1e-9) - jnp.bfloat16(1e9))
                    newk = jnp.full((B, H, HD), 1.0, jnp.float32) \
                        * (i + 1).astype(jnp.float32)
                    for li in range(L):
                        qn, sn = quantize_vecs(newk + li)
                        pka = (pka[0].at[li, slot, off].set(qn),
                               pka[1].at[li, slot, off].set(sn))
                        pva = (pva[0].at[li, slot, off].set(qn),
                               pva[1].at[li, slot, off].set(sn))
                        attn = paged_decode_attention(
                            qs, flat(pka[0]), flat(pva[0]), tables, pos,
                            scales=(flat(pka[1]), flat(pva[1])),
                            page_base=li * n_pages)
                        acc = acc + attn.astype(jnp.float32)
                    return (pka, pva, acc, pos + 1)
                acc = jnp.zeros((B, H, HD), jnp.float32)
                pka, pva, acc, pos = lax.fori_loop(
                    0, K, body, (pka, pva, acc, pos))
                return acc[0, 0, 0] + pos[0].astype(jnp.float32)
            return lambda: f(qk, qv, pos0, q0)
        return mk

    variants = [
        ("scat_bf16", mk_scatter(False)),
        ("scat_int8", mk_scatter(True)),
        ("kern_bf16", mk_kernel(False)),
        ("kern_int8", mk_kernel(True)),
        ("both_int8", mk_both()),
    ]
    res = {}
    for rnd in range(2):
        for name, mk in variants:
            dt = slope_time(mk, k1=4, k2=16, label=f"{name}[r{rnd}]", reps=1)
            res.setdefault(name, []).append(dt)
    print("\n=== kv8 probe (per decode-step-equivalent, 8 layers) ===")
    for name, ds in res.items():
        print(f"{name:>10}: {min(ds)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
