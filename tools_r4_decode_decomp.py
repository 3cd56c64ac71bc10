"""Round-4: decompose the paged-decode step cost (VERDICT r3 missing #5 follow-up).

BENCH_r04 shows decode at only 10-23% of the HBM roofline.  This tool
breaks the per-step wall into phases by timing ablated variants of the
decode step, interleaved in one process (verify-skill rule):

  full     - production paged_decode_step (pallas engine, bf16)
  noattn   - attention kernel replaced by a pass-through of q
  nokv     - no KV-pool writes and no per-layer unstack/restack
  mmonly   - matmuls+norms+head+sample only (no attention, no pool ops)
  stacked  - pools kept (L, ...)-stacked: in-place .at[li, slot, off].set
             + attention reads pools[li] slices (no jnp.stack restack)

Differences attribute the step time: attention kernel = full - noattn,
pool scatter+restack = noattn - mmonly (approx), and `stacked` tests the
restack-free pool design directly.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import slope_time  # noqa: E402
from kfunca_tpu.models.serve import (  # noqa: E402
    _mm, _rope_at, paged_decode_step, sample_tokens, token_logprobs,
)
from kfunca_tpu.models.transformer import (  # noqa: E402
    TransformerConfig, apply_norm, apply_qk_norm, embed_tokens, init_params,
    mlp, split_qkv,
)

L, DM, H = 8, 1024, 16
PAGE, CTX, CAP = 128, 960, 1024
B = 8


def _block_variant(x, p, pool_k, pool_v, page_tables, positions, cfg,
                   page_size, mode, stacked_li=None, stacked_pools=None):
    """Ablated copy of serve._paged_block (bf16, no lora, rope, dense mlp)."""
    b = x.shape[0]
    h, hd = cfg.n_heads, cfg.head_dim

    y = apply_norm(x, p, "attn_norm", cfg)
    qkv = _mm(y, p["wqkv"])
    q, k, v = split_qkv(qkv.astype(y.dtype), cfg)
    q, k = apply_qk_norm(q, k, p, cfg)

    _theta, _pscale = cfg.rope_params()
    rope = jax.vmap(
        lambda xx, pos: _rope_at(xx[None], pos[None], _theta, _pscale,
                                 cfg.rope_pct)[0])
    q = rope(q, positions)
    k = rope(k, positions)

    page_slot = page_tables[jnp.arange(b), positions // page_size]
    offset = positions % page_size
    newk = k[:, :, 0].astype(cfg.act_dtype)
    newv = v[:, :, 0].astype(cfg.act_dtype)

    if mode == "stacked":
        li = stacked_li
        spk, spv = stacked_pools
        spk = spk.at[li, page_slot, offset].set(newk)
        spv = spv.at[li, page_slot, offset].set(newv)
        pool_k = spk[li]
        pool_v = spv[li]
        stacked_pools = (spk, spv)
    elif mode in ("full",):
        pool_k = pool_k.at[page_slot, offset].set(newk)
        pool_v = pool_v.at[page_slot, offset].set(newv)
    # nokv / noattn / mmonly: no pool writes

    scale = 1.0 / np.sqrt(hd)
    if mode in ("full", "nokv", "stacked"):
        from kfunca_tpu.ops.pallas_kernels.paged_attention import (
            paged_decode_attention,
        )
        qs = q[:, :, 0] * jnp.asarray(scale, q.dtype)
        attn = paged_decode_attention(qs, pool_k, pool_v, page_tables,
                                      positions)
        attn = attn.astype(x.dtype).reshape(b, 1, h * hd)
    else:  # noattn / mmonly: stand-in with the same shape/dtype
        attn = (q[:, :, 0] * jnp.asarray(scale, q.dtype)).astype(
            x.dtype).reshape(b, 1, h * hd)

    o = _mm(attn, p["wo"])
    x = x + o.astype(x.dtype)
    y = apply_norm(x, p, "mlp_norm", cfg)
    x = x + mlp(y, p, cfg, mm=_mm).astype(x.dtype)
    return x, pool_k, pool_v, stacked_pools


def make_step(cfg, page_size, mode):
    def step(params, pools_k, pools_v, page_tables, positions, last_tokens,
             key):
        x = embed_tokens(params, last_tokens[:, None], cfg)
        stacked = (pools_k, pools_v) if mode == "stacked" else None
        new_k, new_v = [], []
        for li, p in enumerate(params["blocks"]):
            pk_li = None if mode == "stacked" else pools_k[li]
            pv_li = None if mode == "stacked" else pools_v[li]
            x, pk, pv, stacked = _block_variant(
                x, p, pk_li, pv_li, page_tables, positions, cfg, page_size,
                mode, stacked_li=li, stacked_pools=stacked)
            if mode == "full":
                new_k.append(pk)
                new_v.append(pv)
        if mode == "full":
            pools_k = jnp.stack(new_k)
            pools_v = jnp.stack(new_v)
        elif mode == "stacked":
            pools_k, pools_v = stacked
        x = apply_norm(x, params, "final_norm", cfg)
        logits = jnp.dot(x[:, 0], params["embed"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        tokens = sample_tokens(logits, key, temperature=0.0, top_p=1.0)
        lp = token_logprobs(logits, tokens)
        del lp
        return tokens, pools_k, pools_v
    return step


def main():
    cfg = TransformerConfig(vocab_size=32000, d_model=DM, n_heads=H,
                            n_layers=L, d_ff=4 * DM, max_seq_len=2048)
    max_pages = -(-CAP // PAGE)
    params = init_params(jax.random.PRNGKey(7), cfg)
    key = jax.random.PRNGKey(8)
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

    from jax import lax

    def chain_of(step_fn):
        def mk(K):
            @jax.jit
            def f(prm, pk, pv, pos, toks):
                def body(_, carry):
                    pk, pv, pos, toks = carry
                    toks, pk, pv = step_fn(prm, pk, pv, tables, pos, toks,
                                           key)
                    return (pk, pv, pos + 1, toks)
                pk, pv, pos, toks = lax.fori_loop(0, K, body,
                                                  (pk, pv, pos, toks))
                return toks
            return lambda: f(params, pools_k, pools_v, positions0, tokens0)
        return mk

    def chain_prod():
        def mk(K):
            @jax.jit
            def f(prm, pk, pv, pos, toks):
                def body(_, carry):
                    pk, pv, pos, toks = carry
                    toks, _lp, pk, pv = paged_decode_step(
                        prm, pk, pv, tables, pos, toks, key, cfg, PAGE,
                        0.0, 1.0, "pallas")
                    return (pk, pv, pos + 1, toks)
                pk, pv, pos, toks = lax.fori_loop(0, K, body,
                                                  (pk, pv, pos, toks))
                return toks
            return lambda: f(params, pools_k, pools_v, positions0, tokens0)
        return mk

    variants = [
        ("prod", chain_prod()),
        ("full", chain_of(make_step(cfg, PAGE, "full"))),
        ("stacked", chain_of(make_step(cfg, PAGE, "stacked"))),
        ("nokv", chain_of(make_step(cfg, PAGE, "nokv"))),
        ("noattn", chain_of(make_step(cfg, PAGE, "noattn"))),
        ("mmonly", chain_of(make_step(cfg, PAGE, "mmonly"))),
    ]
    results = {}
    for rnd in range(2):
        for name, mk in variants:
            dt = slope_time(mk, k1=4, k2=16, label=f"{name}[r{rnd}]", reps=1)
            results.setdefault(name, []).append(dt)
    print("\n=== decode step decomposition (B=8 bf16, min of 2 rounds) ===")
    base = min(results["prod"])
    for name, ds in results.items():
        d = min(ds)
        print(f"{name:>8}: {d*1e3:7.3f} ms/step  ({B/d:8.1f} tok/s)  "
              f"{d/base*100:5.1f}% of prod")
    t0 = time.time()
    print(f"[done in {time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
