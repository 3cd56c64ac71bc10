"""r5: page-size sweep for the manual-DMA fused-pool decode step at B=8.

BENCH r5 interim: B8 bf16 decode = 57.6% of HBM roofline vs B4 = 83.7%.
The marginal cost of B8's extra 134 MB of KV is ~0.48 ms -> ~280 GB/s —
far under the 819 GB/s the copies themselves would ride, pointing at
per-copy ISSUE overhead: at page=128 a step moves 512 fused page rows
(B8 x 8 pages x 8 layers) of 512 KB each.  Larger pages move the same
bytes in 4x fewer copies (page=512 -> 2 MB rows).  Interleaved rounds,
production paged_decode_step, bf16 and w8kv8 arms.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import slope_time  # noqa: E402
from kfunca_tpu.models.serve import paged_decode_step  # noqa: E402
from kfunca_tpu.models.transformer import (  # noqa: E402
    TransformerConfig, init_params)

L, dm, h, ctx, capacity, B = 8, 1024, 16, 960, 1024, 8


def make_chain(params, cfg, page):
    max_pages = -(-capacity // page)
    n_pages = B * max_pages + 1
    key = jax.random.PRNGKey(8)
    pools_k = jax.random.normal(
        key, (L, n_pages, page, h, dm // h), cfg.act_dtype)
    pools_v = jax.random.normal(
        key, (L, n_pages, page, h, dm // h), cfg.act_dtype)
    tables = np.zeros((B, max_pages), np.int32)
    for i in range(B):
        tables[i] = np.arange(i * max_pages, (i + 1) * max_pages,
                              dtype=np.int32)
    tables = jnp.asarray(tables)
    positions0 = jnp.full((B,), ctx, jnp.int32)
    tokens0 = jnp.full((B,), 17, jnp.int32)
    _rows = lambda a: a.reshape(L, n_pages, page, -1)
    pools_kv = jnp.concatenate([_rows(pools_k), _rows(pools_v)], axis=3)

    def mk(K):
        @jax.jit
        def f(prm, pk, pos, toks):
            def body(_, carry):
                pk, pos, toks = carry
                toks, _lp, pk, _pv = paged_decode_step(
                    prm, pk, None, tables, pos, toks, key, cfg, page,
                    0.0, 1.0, "pallas")
                return (pk, pos + 1, toks)
            pk, pos, toks = lax.fori_loop(0, K, body,
                                          (pk, pos, tokens0))
            return toks
        return lambda: f(params, pools_kv, positions0, tokens0)
    return mk


def main():
    cfg = TransformerConfig(vocab_size=32000, d_model=dm, n_heads=h,
                            n_layers=L, d_ff=4 * dm, max_seq_len=2048)
    params = init_params(jax.random.PRNGKey(7), cfg)
    pages = (128, 256, 512)
    chains = {p: make_chain(params, cfg, p) for p in pages}
    res = {p: [] for p in pages}
    for rnd in range(3):
        for p in pages:
            dt = slope_time(chains[p], k1=4, k2=16,
                            label=f"page{p}[r{rnd}]", reps=1)
            res[p].append(dt)
    print("\n=== page-size sweep, bf16 fused DMA decode, B=8 ===")
    for p, ds in res.items():
        best = min(ds)
        print(f"page {p:>4}: best {best*1e3:.3f} ms/step = "
              f"{B/best:.0f} tok/s  (rounds: {[round(d*1e3,3) for d in ds]})")


if __name__ == "__main__":
    main()
