"""Round-4: A/B the reworked paged_decode_step (stacked in-place pools +
page_base kernel reads) on the real TPU, all engines, B=4/8.

Measures the PRODUCTION paged_decode_step exactly as bench_serving does;
compare against BENCH_r03/bench_r4a (pre-rework: pallas B8 ~4.44 ms/step
= 1802 tok/s).  Also asserts pallas-vs-xla parity on-chip so the rework
cannot silently change semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax import lax  # noqa: E402

from bench import slope_time  # noqa: E402
from kfunca_tpu.models.serve import (  # noqa: E402
    paged_decode_step, quantize_decode_params,
)
from kfunca_tpu.models.transformer import (  # noqa: E402
    TransformerConfig, init_params,
)

L, DM, H = 8, 1024, 16
PAGE, CTX, CAP = 128, 960, 1024


def main():
    cfg = TransformerConfig(vocab_size=32000, d_model=DM, n_heads=H,
                            n_layers=L, d_ff=4 * DM, max_seq_len=2048)
    max_pages = -(-CAP // PAGE)
    params = init_params(jax.random.PRNGKey(7), cfg)
    qparams = quantize_decode_params(params)
    key = jax.random.PRNGKey(8)

    from kfunca_tpu.ops.quant import quantize_vecs

    for B in (8, 4):
        n_pages = B * max_pages + 1
        pools_k = jax.random.normal(key, (L, n_pages, PAGE, H, DM // H),
                                    cfg.act_dtype)
        pools_v = jax.random.normal(key, (L, n_pages, PAGE, H, DM // H),
                                    cfg.act_dtype)
        tables = np.full((B, max_pages), n_pages - 1, np.int32)
        for i in range(B):
            tables[i] = np.arange(i * max_pages, (i + 1) * max_pages,
                                  dtype=np.int32)
        tables = jnp.asarray(tables)
        positions0 = jnp.full((B,), CTX, jnp.int32)
        tokens0 = jnp.full((B,), 17, jnp.int32)
        qpools_k = quantize_vecs(pools_k)
        qpools_v = quantize_vecs(pools_v)

        # parity: one step, pallas vs xla logits-derived tokens + logprobs
        # (the step DONATES the pools — hand each call its own copy)
        tk_p, lp_p, _, _ = paged_decode_step(
            params, jnp.copy(pools_k), jnp.copy(pools_v), tables, positions0,
            tokens0, key, cfg, PAGE, 0.0, 1.0, "pallas")
        tk_x, lp_x, _, _ = paged_decode_step(
            params, jnp.copy(pools_k), jnp.copy(pools_v), tables, positions0,
            tokens0, key, cfg, PAGE, 0.0, 1.0, "xla")
        tk_p, tk_x = np.asarray(tk_p), np.asarray(tk_x)
        dlp = float(np.abs(np.asarray(lp_p) - np.asarray(lp_x)).max())
        print(f"[parity B={B}] tokens match {int((tk_p == tk_x).sum())}/{B}, "
              f"max |dlogprob| = {dlp:.2e}")
        assert (tk_p == tk_x).all() and dlp < 5e-2, (tk_p, tk_x, dlp)

        def chain(engine, q8=False, kv8=False):
            prm_in = qparams if q8 else params
            pk_in = qpools_k if kv8 else pools_k
            pv_in = qpools_v if kv8 else pools_v

            def mk(K):
                @jax.jit
                def f(prm, pk, pv, pos, toks):
                    def body(_, carry):
                        pk, pv, pos, toks = carry
                        toks, _lp, pk, pv = paged_decode_step(
                            prm, pk, pv, tables, pos, toks, key, cfg, PAGE,
                            0.0, 1.0, engine)
                        return (pk, pv, pos + 1, toks)
                    pk, pv, pos, toks = lax.fori_loop(
                        0, K, body, (pk, pv, pos, toks))
                    return toks
                return lambda: f(prm_in, pk_in, pv_in, positions0, tokens0)
            return mk

        for label, ch in (("pallas", chain("pallas")),
                          ("pallas_w8", chain("pallas", q8=True)),
                          ("pallas_w8kv8", chain("pallas", q8=True, kv8=True)),
                          ("xla", chain("xla"))):
            dt = slope_time(ch, k1=4, k2=16, label=f"B{B}-{label}", reps=2)
            print(f"==> B{B} {label}: {dt*1e3:.3f} ms/step = "
                  f"{B/dt:,.0f} tok/s")


if __name__ == "__main__":
    main()
