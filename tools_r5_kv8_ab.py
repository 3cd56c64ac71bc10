"""r5: INTERLEAVED same-process A/B of w8 vs w8kv8 decode at B=8 (the
VERDICT r4 #1 acceptance test; sequential bench phases drift 10-30% so the
bench rows alone can't carry the claim).  Rounds alternate A,B,A,B."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import slope_time  # noqa: E402
from kfunca_tpu.models.serve import (  # noqa: E402
    paged_decode_step, quantize_decode_params)
from kfunca_tpu.models.transformer import TransformerConfig, init_params  # noqa: E402
from kfunca_tpu.ops.quant import quantize_vecs  # noqa: E402

L, dm, h, page, ctx, capacity = 8, 1024, 16, 128, 960, 1024


def main():
    cfg = TransformerConfig(vocab_size=32000, d_model=dm, n_heads=h,
                            n_layers=L, d_ff=4 * dm, max_seq_len=2048)
    max_pages = -(-capacity // page)
    params = init_params(jax.random.PRNGKey(7), cfg)
    qparams = quantize_decode_params(params)
    key = jax.random.PRNGKey(8)
    B = 8
    n_pages = B * max_pages + 1
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
    qpk, qpv = quantize_vecs(pools_k), quantize_vecs(pools_v)
    _rows = lambda a: a.reshape(L, n_pages, page, -1)
    pools_kv = jnp.concatenate([_rows(pools_k), _rows(pools_v)], axis=3)
    q8_kv = jnp.concatenate([_rows(qpk[0]), _rows(qpv[0])], axis=3)
    q8_sc = jnp.concatenate([qpk[1], qpv[1]], axis=3)
    q8_sc = jnp.pad(q8_sc, ((0, 0),) * 3 + ((0, 128 - q8_sc.shape[3]),))

    def chain(kv8):
        pk_in = (q8_kv, q8_sc) if kv8 else pools_kv

        def mk(K):
            @jax.jit
            def f(prm, pk, pos, toks):
                def body(_, carry):
                    pk, pos, toks = carry
                    toks, _lp, pk, _pv = paged_decode_step(
                        prm, pk, None, tables, pos, toks, key, cfg, page,
                        0.0, 1.0, "pallas")
                    return (pk, pos + 1, toks)
                pk, pos, toks = lax.fori_loop(
                    0, K, body, (pk, pos, toks))
                return toks
            return lambda: f(qparams, pk_in, positions0, tokens0)
        return mk

    res = {"w8": [], "w8kv8": []}
    for rnd in range(4):
        for name, kv8 in (("w8", False), ("w8kv8", True)):
            dt = slope_time(chain(kv8), k1=4, k2=16,
                            label=f"{name}[r{rnd}]", reps=1)
            res[name].append(dt)
    print("\n=== interleaved w8 vs w8kv8 decode, B=8 ===")
    for name, ds in res.items():
        best = min(ds)
        print(f"{name:>6}: best {best*1e3:.3f} ms/step = {8/best:.0f} tok/s"
              f"   (rounds: {[round(d*1e3,3) for d in ds]})")
    wins = sum(1 for a, b in zip(res["w8"], res["w8kv8"]) if b < a)
    print(f"w8kv8 wins {wins}/4 rounds; "
          f"best-vs-best ratio {min(res['w8'])/min(res['w8kv8']):.3f}x")


if __name__ == "__main__":
    main()
