"""Round-4: tune the paged-decode kernel — fanin sweep (pages per grid
step) for bf16 and int8(folded-scale) pools, 8-layer decode-step
equivalents, interleaved.  Follows tools_r4_kv8_probe.py which found
per-grid-step overhead (not DMA) dominates: kern_bf16 1.0 ms vs ~0.3 ms
DMA floor, and the old element-wise dequant made int8 2x bf16.
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
    qk = quantize_vecs(pk)
    qv = quantize_vecs(pv)
    tables = np.zeros((B, MAXP), np.int32)
    for i in range(B):
        tables[i] = np.arange(i * MAXP, (i + 1) * MAXP, dtype=np.int32)
    tables = jnp.asarray(tables)
    pos0 = jnp.full((B,), CTX, jnp.int32)
    q0 = jax.random.normal(key, (B, H, HD), jnp.bfloat16) * 0.1

    flat = lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])

    # on-chip correctness: fanin vs fanin=1, both dtypes
    for quant in (False, True):
        if quant:
            args = (flat(qk[0]), flat(qv[0]))
            kw0 = dict(scales=(flat(qk[1]), flat(qv[1])))
        else:
            args = (flat(pk), flat(pv))
            kw0 = {}
        want = paged_decode_attention(q0, *args, tables, pos0,
                                      page_base=2 * n_pages, fanin=1, **kw0)
        for fanin in (2, 4):  # fanin=8 exceeds the 16 MB scoped-VMEM limit
            got = paged_decode_attention(q0, *args, tables, pos0,
                                         page_base=2 * n_pages, fanin=fanin,
                                         **kw0)
            d = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                      - want.astype(jnp.float32))))
            print(f"[oracle quant={quant} fanin={fanin}] maxdiff {d:.2e}")
            assert d < 2e-2, (quant, fanin, d)

    def mk_kernel(quant, fanin, mxu=False, flat3=False):
        def mk(K):
            @jax.jit
            def f(pka, pva, pos, q):
                if quant:
                    fk, sk = flat(pka[0]), flat(pka[1])
                    fv, sv = flat(pva[0]), flat(pva[1])
                else:
                    fk, fv = flat(pka), flat(pva)
                if flat3:  # pre-flatten heads OUTSIDE the layer loop
                    fk = fk.reshape(fk.shape[0], PAGE, H * HD)
                    fv = fv.reshape(fv.shape[0], PAGE, H * HD)

                def body(i, carry):
                    acc, q, pos = carry
                    qs = jnp.maximum(q, acc.astype(q.dtype) * jnp.bfloat16(
                        1e-9) - jnp.bfloat16(1e9))
                    for li in range(L):
                        kw = dict(page_base=li * n_pages, fanin=fanin,
                                  mxu=mxu)
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

    variants = [
        ("bf16_f1", mk_kernel(False, 1)),
        ("int8_f1", mk_kernel(True, 1)),
        ("bf16_mxu", mk_kernel(False, 1, mxu=True)),
        ("int8_mxu", mk_kernel(True, 1, mxu=True)),
        ("bf16_mxu3", mk_kernel(False, 1, mxu=True, flat3=True)),
        ("int8_mxu3", mk_kernel(True, 1, mxu=True, flat3=True)),
    ]
    res = {}
    for rnd in range(2):
        for name, mk in variants:
            dt = slope_time(mk, k1=4, k2=16, label=f"{name}[r{rnd}]", reps=1)
            res.setdefault(name, []).append(dt)
    print("\n=== paged kernel tune (8 kernel calls per step-equivalent) ===")
    for name, ds in res.items():
        print(f"{name:>9}: {min(ds)*1e3:7.3f} ms  "
              f"({min(ds)/L*1e6:6.1f} us/kernel)")


if __name__ == "__main__":
    main()
