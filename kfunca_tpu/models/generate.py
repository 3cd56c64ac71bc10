"""Autoregressive generation with a KV cache (serving path).

Green-field capability (the reference ships no models, no serving).
TPU-first construction:

  * the KV cache is a static-shape (B, H, max_len, hd) buffer per layer;
    writes are dynamic_update_slice (XLA aliases them in place under jit),
    so one compiled decode step serves the whole generation — no dynamic
    shapes, no recompiles.
  * prefill processes the whole prompt in one call (flash-attention-sized
    matmuls on the MXU); decode steps attend q-len-1 against the cache with
    a position mask.
  * the decode loop is a lax.scan carrying (cache, token, pos): the entire
    generation compiles to a single XLA program.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .transformer import TransformerConfig, apply_norm, embed_tokens, lm_head_weight


def init_kv_cache(cfg: TransformerConfig, batch: int, max_len: int):
    if cfg.attention == "mla":  # compressed latent cache (models/mla.py)
        from .mla import init_mla_cache

        return init_mla_cache(cfg, batch, max_len)
    # GQA: the cache holds only kv_heads — the memory win that motivates it
    shape = (batch, cfg.kv_heads, max_len, cfg.head_dim)
    return [
        {
            "k": jnp.zeros(shape, cfg.act_dtype),
            "v": jnp.zeros(shape, cfg.act_dtype),
        }
        for _ in range(cfg.n_layers)
    ]


def _rope_at(x, positions, theta: float, pos_scale: float = 1.0,
             pct: float = 1.0):
    """RoPE with explicit absolute positions; x: (B, H, T, D), positions (T,).
    pos_scale < 1 is linear position interpolation (rope_scaling); pct < 1
    rotates only the first pct of head dims (GPT-NeoX rotary_pct)."""
    if pct < 1.0:
        rot = int(x.shape[-1] * pct) & ~1
        return jnp.concatenate(
            [_rope_at(x[..., :rot], positions, theta, pos_scale),
             x[..., rot:]], axis=-1)
    b, h, t, d = x.shape
    half = d // 2
    freqs = jnp.exp(-math.log(theta) * jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = (positions.astype(jnp.float32) * jnp.float32(pos_scale))[:, None] * freqs[None, :]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    return jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)


def cached_attention_mixer(y, p, layer_cache, start_pos,
                           cfg: TransformerConfig):
    """Causal attention over T new tokens at absolute start_pos, reading/
    writing the KV cache: y (B, T, d) normed input -> (o (B, T, d) fp32,
    new_layer_cache).  Factored out of _block_with_cache so heterogeneous
    stacks (models/hybrid.py) can reuse the exact decode mixer."""
    b, t, dm = y.shape
    h, hd = cfg.n_heads, cfg.head_dim
    max_len = layer_cache["k"].shape[2]

    qkv = jnp.dot(y, p["wqkv"].astype(y.dtype), preferred_element_type=jnp.float32)
    if "bqkv" in p:  # optional QKV bias (Qwen2/GPT-2-family HF imports)
        qkv = qkv + p["bqkv"]
    from .transformer import apply_qk_norm, split_qkv

    q, k, v = split_qkv(qkv.astype(y.dtype), cfg)  # q (B,H,..), k/v (B,Hkv,..)
    q, k = apply_qk_norm(q, k, p, cfg)  # Qwen3-family per-head q/k norm
    positions = start_pos + jnp.arange(t)
    if cfg.pos == "rope":
        theta, pscale = cfg.rope_params()
        q = _rope_at(q, positions, theta, pscale, cfg.rope_pct)
        k = _rope_at(k, positions, theta, pscale, cfg.rope_pct)

    zero = jnp.int32(0)  # all indices same dtype (x64 would promote raw 0s)
    idx = (zero, zero, start_pos.astype(jnp.int32), zero)
    kc = jax.lax.dynamic_update_slice(layer_cache["k"], k, idx)
    vc = jax.lax.dynamic_update_slice(layer_cache["v"], v, idx)

    # attend the T new queries against the first start_pos+T cache entries.
    # GQA: q grouped (B, Hkv, G, T, hd) against the shared kv head — the
    # repeated kv is never materialized
    hkv = cfg.kv_heads
    group = h // hkv
    scale = 1.0 / math.sqrt(hd)
    qg = q.reshape(b, hkv, group, t, hd)
    s = jnp.einsum(
        "bkgtd,bkld->bkgtl", qg.astype(jnp.float32), kc.astype(jnp.float32)
    ) * scale
    q_pos = positions[:, None]  # (T, 1)
    l_pos = jnp.arange(max_len)[None, :]  # (1, L)
    mask = l_pos <= q_pos
    if cfg.attention_window is not None:
        mask = mask & (l_pos > q_pos - cfg.attention_window)
    s = jnp.where(mask, s, jnp.float32(-1e30))
    prob = jax.nn.softmax(s, axis=-1)
    attn = jnp.einsum("bkgtl,bkld->bkgtd", prob, vc.astype(jnp.float32)).astype(y.dtype)
    attn = attn.reshape(b, h, t, hd).transpose(0, 2, 1, 3).reshape(b, t, dm)
    o = jnp.dot(attn, p["wo"].astype(attn.dtype),
                preferred_element_type=jnp.float32)
    if "bo" in p:  # optional output-projection bias (GPT-2/NeoX family)
        o = o + p["bo"]
    return o, {"k": kc, "v": vc}


def _block_with_cache(x, p, layer_cache, start_pos, cfg: TransformerConfig):
    """Apply one block over T new tokens at absolute position start_pos,
    reading/writing the KV cache. Returns (x, new_layer_cache)."""
    if cfg.attention == "mla":  # absorbed-form latent decode (models/mla.py)
        from .mla import mla_block_with_cache

        return mla_block_with_cache(x, p, layer_cache, start_pos, cfg)
    y = apply_norm(x, p, "attn_norm", cfg)
    o, new_cache = cached_attention_mixer(y, p, layer_cache, start_pos, cfg)
    from .transformer import mlp

    if cfg.parallel_residual:  # GPT-NeoX/GPT-J: branches share the input
        y = apply_norm(x, p, "mlp_norm", cfg)
        return (x + o.astype(x.dtype) + mlp(y, p, cfg).astype(x.dtype),
                new_cache)
    x = x + o.astype(x.dtype)
    y = apply_norm(x, p, "mlp_norm", cfg)
    x = x + mlp(y, p, cfg).astype(x.dtype)
    return x, new_cache


def forward_with_cache(params, tokens, cache, start_pos, cfg: TransformerConfig):
    """tokens (B, T) at absolute start_pos -> (logits (B, T, V), new cache)."""
    x = embed_tokens(params, tokens, cfg)
    if cfg.pos == "learned":
        pos = start_pos + jnp.arange(tokens.shape[1])
        x = x + jnp.take(params["pos_embed"], pos, axis=0).astype(cfg.act_dtype)
    new_cache = []
    for p, lc in zip(params["blocks"], cache):
        x, nlc = _block_with_cache(x, p, lc, start_pos, cfg)
        new_cache.append(nlc)
    x = apply_norm(x, params, "final_norm", cfg)
    logits = jnp.dot(
        x, lm_head_weight(params, x.dtype), preferred_element_type=jnp.float32
    )
    return logits, new_cache


@partial(jax.jit, static_argnames=("cfg", "max_new", "temperature"))
def generate(params, prompt, cfg: TransformerConfig, max_new: int, temperature=0.0, key=None):
    """Greedy (temperature=0) or sampled generation.

    prompt: (B, T_prompt) int32.  Returns (B, max_new) generated tokens.
    The whole loop is one compiled program: prefill + scan of decode steps.
    `temperature` is static: the greedy/sampled branch is a Python-level
    choice (a traced temperature would make `temperature == 0.0` raise
    TracerBoolConversionError), and each distinct value compiles once.
    """
    b, t_prompt = prompt.shape
    max_len = t_prompt + max_new
    cache = init_kv_cache(cfg, b, max_len)
    if key is None:
        key = jax.random.PRNGKey(0)

    logits, cache = forward_with_cache(
        params, prompt, cache, jnp.int32(0), cfg
    )  # prefill
    last = logits[:, -1]

    def pick(logits_1, k):
        if temperature == 0.0:
            return jnp.argmax(logits_1, axis=-1).astype(jnp.int32)
        return jax.random.categorical(k, logits_1 / temperature, axis=-1).astype(jnp.int32)

    def step(carry, i):
        cache, logits_1, key = carry
        key, sub = jax.random.split(key)
        tok = pick(logits_1, sub)
        lg, cache = forward_with_cache(
            params, tok[:, None], cache, (t_prompt + i).astype(jnp.int32), cfg
        )
        return (cache, lg[:, -1], key), tok

    (_, _, _), toks = jax.lax.scan(
        step, (cache, last, key), jnp.arange(max_new)
    )
    return toks.T  # (B, max_new)


@partial(jax.jit, static_argnames=("cfg", "max_new", "beam", "length_penalty", "eos"))
def beam_search(params, prompt, cfg: TransformerConfig, max_new: int, beam: int = 4,
                length_penalty: float = 0.0, eos: int | None = None):
    """Beam-search decoding: ONE compiled program (prefill + lax.scan),
    beams as batch lanes.

    prompt (B, T) int32 -> (tokens (B, beam, max_new), scores (B, beam)),
    beams sorted best-first.  Scores are summed raw log-probs; with
    length_penalty a > 0, final ranking divides by the GNMT penalty
    ((5 + len) / 6) ** a.  `eos` (static) freezes finished beams: they
    emit eos forever at unchanged score, so shorter finished hypotheses
    compete with live ones.

    TPU notes: the beam dim rides the batch dim (B*beam lanes) so every
    matmul stays a single large MXU program; per-step cache reordering is
    one gather per layer along the lane dim.  lax.top_k is safe here —
    k = beam is tiny (the compiler crash is for k >= ~2049, see serve.py).
    """
    b, t_prompt = prompt.shape
    w = beam
    max_len = t_prompt + max_new
    neg = jnp.float32(-1e30)

    # prefill once at (B, T), then tile cache/state to B*w lanes
    cache = init_kv_cache(cfg, b, max_len)
    logits, cache = forward_with_cache(params, prompt, cache, jnp.int32(0), cfg)
    cache = [
        {k: jnp.repeat(v, w, axis=0) for k, v in lc.items()} for lc in cache
    ]
    last_lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
    last_lp = jnp.repeat(last_lp, w, axis=0)  # (B*w, V)

    # beam 0 starts at 0, the rest at -inf so step 1 picks w DISTINCT
    # continuations of the single prompt hypothesis
    scores = jnp.tile(jnp.asarray([0.0] + [-1e30] * (w - 1), jnp.float32), (b, 1))
    seqs = jnp.zeros((b, w, max_new), jnp.int32)
    done = jnp.zeros((b, w), bool)
    lengths = jnp.zeros((b, w), jnp.int32)

    v_size = cfg.vocab_size

    def step(carry, i):
        cache, lp, scores, seqs, done, lengths = carry
        lp = lp.reshape(b, w, v_size)
        if eos is not None:
            # finished beams: only eos continues, at zero added cost
            frozen = jnp.full((v_size,), neg).at[eos].set(0.0)
            lp = jnp.where(done[:, :, None], frozen[None, None, :], lp)
        total = scores[:, :, None] + lp  # (B, w, V)
        top_val, top_idx = jax.lax.top_k(total.reshape(b, w * v_size), w)
        parent = (top_idx // v_size).astype(jnp.int32)  # (B, w)
        tok = (top_idx % v_size).astype(jnp.int32)

        # reorder histories and per-beam state by parent
        seqs = jnp.take_along_axis(seqs, parent[:, :, None], axis=1)
        seqs = jax.lax.dynamic_update_index_in_dim(
            seqs.transpose(2, 0, 1), tok, i, axis=0
        ).transpose(1, 2, 0)
        done = jnp.take_along_axis(done, parent, axis=1)
        lengths = jnp.take_along_axis(lengths, parent, axis=1)
        lengths = jnp.where(done, lengths, lengths + 1)
        if eos is not None:
            done = done | (tok == eos)
        # reorder the KV cache: lane index = b_idx * w + parent
        lane = (jnp.arange(b, dtype=jnp.int32)[:, None] * w + parent).reshape(-1)
        cache = [{k: v[lane] for k, v in lc.items()} for lc in cache]

        lg, cache = forward_with_cache(
            params, tok.reshape(b * w, 1), cache,
            (t_prompt + i).astype(jnp.int32), cfg,
        )
        lp_next = jax.nn.log_softmax(lg[:, -1].astype(jnp.float32), axis=-1)
        return (cache, lp_next, top_val, seqs, done, lengths), None

    init = (cache, last_lp, scores, seqs, done, lengths)
    (cache, _, scores, seqs, done, lengths), _ = jax.lax.scan(
        step, init, jnp.arange(max_new)
    )

    ranked = scores
    if length_penalty > 0.0:
        pen = ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** jnp.float32(length_penalty)
        ranked = scores / pen
    order = jnp.argsort(-ranked, axis=1)
    seqs = jnp.take_along_axis(seqs, order[:, :, None], axis=1)
    scores = jnp.take_along_axis(ranked, order, axis=1)
    return seqs, scores
