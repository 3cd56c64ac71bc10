"""Round-5: attack the decode kernel's per-grid-step overhead (VERDICT r4
next-round #1).

tools_r4_kv8_probe found the attention kernel IS the decode step (1.09 of
~1.2 ms at B=8 bf16) and runs at ~15% of its own DMA roofline — the cost is
per-grid-step overhead, not bytes (int8 halves the bytes and is *slower*).

Variants (kernel-only chains, 8 layer-calls per step-equivalent,
slope-timed, interleaved in one process):
  f4_bf16   - production today: fanin=4, grid (B, 2)
  f8_bf16   - fanin=8 = max_pages, grid (B, 1)
  f8_int8   - same with int8 pools + separate scale pools
  f4_int8   - production quantized today
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax import lax  # noqa: E402

from bench import slope_time  # noqa: E402
from kfunca_tpu.ops.pallas_kernels.paged_attention import (  # noqa: E402
    paged_decode_attention,
    paged_decode_attention_dma,
)
from kfunca_tpu.ops.quant import quantize_vecs  # noqa: E402

import os
PAGE = int(os.environ.get("PROBE_PAGE", "128"))
L, H, HD = 8, 16, 64
B, CTX, CAP = 8, 960, 1024
MAXP = CAP // PAGE


def main():
    key = jax.random.PRNGKey(0)
    n_pages = B * MAXP + 1
    pk = jax.random.normal(key, (L, n_pages, PAGE, H, HD), jnp.bfloat16)
    pv = jax.random.normal(key, (L, n_pages, PAGE, H, HD), jnp.bfloat16)
    qk = quantize_vecs(pk)
    qv = quantize_vecs(pv)
    tables = np.zeros((B, MAXP), np.int32)
    for i in range(B):
        tables[i] = np.arange(i * MAXP, (i + 1) * MAXP, dtype=np.int32)
    tables = jnp.asarray(tables)
    pos0 = jnp.full((B,), CTX, jnp.int32)
    q0 = jax.random.normal(key, (B, H, HD), jnp.bfloat16) * 0.1

    flat = lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])

    def mk_kernel(quant, fanin):
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
                        kw = dict(page_base=li * n_pages, fanin=fanin)
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

    def mk_dma(quant, depth):
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
                        kw = dict(page_base=li * n_pages, depth=depth)
                        if quant:
                            attn = paged_decode_attention_dma(
                                qs, fk, fv, tables, pos,
                                scales=(sk, sv), **kw)
                        else:
                            attn = paged_decode_attention_dma(
                                qs, fk, fv, tables, pos, **kw)
                        acc = acc + attn.astype(jnp.float32)
                    return (acc, q, pos)
                acc = jnp.zeros((B, H, HD), jnp.float32)
                acc, q, pos = lax.fori_loop(0, K, body, (acc, q, pos))
                return acc[0, 0, 0]
            src = (qk, qv) if quant else (pk, pv)
            return lambda: f(src[0], src[1], pos0, q0)
        return mk

    # fused k|v pools: one page row holds k then v; scales head-major
    fkv = jnp.concatenate(
        [pk.reshape(L, n_pages, PAGE, -1), pv.reshape(L, n_pages, PAGE, -1)],
        axis=3)
    fqkv = jnp.concatenate(
        [qk[0].reshape(L, n_pages, PAGE, -1),
         qv[0].reshape(L, n_pages, PAGE, -1)], axis=3)
    fscale = jnp.concatenate(
        [jnp.swapaxes(qk[1], 2, 3), jnp.swapaxes(qv[1], 2, 3)], axis=2)

    def mk_dma_fused(quant, depth):
        def mk(K):
            @jax.jit
            def f(pka, sca, pos, q):
                fk = flat(pka)
                sc = flat(sca) if quant else None

                def body(i, carry):
                    acc, q, pos = carry
                    qs = jnp.maximum(q, acc.astype(q.dtype) * jnp.bfloat16(
                        1e-9) - jnp.bfloat16(1e9))
                    for li in range(L):
                        kw = dict(page_base=li * n_pages, depth=depth)
                        if quant:
                            attn = paged_decode_attention_dma(
                                qs, fk, None, tables, pos,
                                scales=sc, **kw)
                        else:
                            attn = paged_decode_attention_dma(
                                qs, fk, None, tables, pos, **kw)
                        acc = acc + attn.astype(jnp.float32)
                    return (acc, q, pos)
                acc = jnp.zeros((B, H, HD), jnp.float32)
                acc, q, pos = lax.fori_loop(0, K, body, (acc, q, pos))
                return acc[0, 0, 0]
            src = (fqkv, fscale) if quant else (fkv, None)
            return lambda: f(src[0], src[1], pos0, q0)
        return mk

    import os as _os
    sel = _os.environ.get("PROBE_SEL", "")
    variants = [
        ("f4_bf16", mk_kernel(False, 4)),
        ("f8_bf16", mk_kernel(False, 8)),
        ("f4_int8", mk_kernel(True, 4)),
        ("f8_int8", mk_kernel(True, 8)),
        ("dma2_bf16", mk_dma(False, 2)),
        ("dma4_bf16", mk_dma(False, 4)),
        ("dma8_bf16", mk_dma(False, 8)),
        ("dma4_int8", mk_dma(True, 4)),
        ("dma8_int8", mk_dma(True, 8)),
        ("fdma4_bf16", mk_dma_fused(False, 4)),
        ("fdma8_bf16", mk_dma_fused(False, 8)),
        ("fdma4_int8", mk_dma_fused(True, 4)),
        ("fdma8_int8", mk_dma_fused(True, 8)),
    ]
    if sel:
        keep = sel.split(",")
        variants = [v for v in variants if v[0] in keep]
    res = {}
    for rnd in range(2):
        for name, mk in variants:
            dt = slope_time(mk, k1=4, k2=16, label=f"{name}[r{rnd}]", reps=1)
            res.setdefault(name, []).append(dt)
    print("\n=== r5 decode fanin probe (per step-equivalent, 8 layers) ===")
    bytes_bf16 = L * B * MAXP * PAGE * H * HD * 2 * 2
    bytes_int8 = L * B * MAXP * PAGE * H * (HD + 4) * 2
    for name, ds in res.items():
        d = min(ds)
        nbytes = bytes_int8 if "int8" in name else bytes_bf16
        gbps = nbytes / d / 1e9
        print(f"{name:>10}: {d*1e3:7.3f} ms   kv-read {gbps:6.1f} GB/s")


if __name__ == "__main__":
    main()
