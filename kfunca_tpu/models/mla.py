"""Multi-head latent attention (MLA, DeepSeek-V2/V3).

A flagship-family attention option (TransformerConfig.attention = "mla"):
queries, keys and values are low-rank factored through a shared latent —
K/V expand from one compressed vector c_kv per position instead of living
as full per-head tensors.  What that buys on TPU:

  * the decode cache per layer is (kv_lora_rank + qk_rope_head_dim) floats
    per position — independent of the head count (vs 2 * h * head_dim for
    MHA; at DeepSeek-V2 scale a ~15x KV-cache HBM cut, the difference
    between spilling and fitting long contexts);
  * decode attention runs in the ABSORBED form: q is projected once
    through w_uk into latent space, scores are dots against the latent
    cache directly, and values re-expand AFTER the weighted sum — per
    step the big matmuls are (t, d_c)-shaped MXU work and the full K/V
    are never materialized.

Training uses the expanded form (materialize per-head K/V for the one
sequence being processed) because there the FLOPs already dominate and
the expanded tensors are transient: with the default head geometry
(qk_nope 64 + qk_rope 64 = v 128) q/k/v head dims match and the fused
Pallas flash kernel (ops/pallas_kernels/flash_attention.py) applies
unchanged.  Any other geometry falls back to the einsum path (the same
numerics oracle the flash kernel is tested against).

Param layout per block (replacing "wqkv"; "wo" stays):
    w_dq (d, q_rank), q_norm (q_rank,), w_uq (q_rank, h*qk_head)   [q_rank>0]
    w_q  (d, h*qk_head)                                            [q_rank=0]
    w_dkv (d, kv_rank + qk_rope)   — latent + the SHARED rope key
    kv_norm (kv_rank,)             — RMSNorm on the latent (DeepSeek)
    w_uk (kv_rank, h*qk_nope), w_uv (kv_rank, h*v_dim)
RoPE applies only to the decoupled rope dims: per-head on q_pe, single
shared head on k_pe (broadcast to all heads at score time) — the
decoupling that makes the latent cache position-independent.

No reference analog (the reference's attention is plain single-chip MHA,
/root/reference/src/device/utils/causal_attention.h); green-field like the
rest of the model zoo.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .transformer import (
    TransformerConfig,
    _init_linear,
    _mm_with_lora,
    _rope,
    apply_norm,
    mlp,
    rms_norm,
)


def mla_dims(cfg: TransformerConfig):
    """(h, qk_head, nope, rope, v_dim, kv_rank) for the config."""
    nope, rope = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    v_dim = cfg.v_head_dim or (nope + rope)
    return cfg.n_heads, nope + rope, nope, rope, v_dim, cfg.kv_lora_rank


def init_mla_block(key, cfg: TransformerConfig):
    """MLA attention params for one block (the caller adds norms + MLP)."""
    h, qk, nope, rope, v_dim, d_c = mla_dims(cfg)
    k = [jax.random.fold_in(key, i) for i in range(6)]
    blk = {}
    if cfg.q_lora_rank:
        blk["w_dq"] = _init_linear(k[0], cfg.d_model, cfg.q_lora_rank)
        blk["q_norm"] = jnp.ones((cfg.q_lora_rank,), jnp.float32)
        blk["w_uq"] = _init_linear(k[1], cfg.q_lora_rank, h * qk)
    else:
        blk["w_q"] = _init_linear(k[0], cfg.d_model, h * qk)
    blk["w_dkv"] = _init_linear(k[2], cfg.d_model, d_c + rope)
    blk["kv_norm"] = jnp.ones((d_c,), jnp.float32)
    blk["w_uk"] = _init_linear(k[3], d_c, h * nope)
    blk["w_uv"] = _init_linear(k[4], d_c, h * v_dim)
    blk["wo"] = _init_linear(k[5], h * v_dim, cfg.d_model)
    return blk


def _mm(y, w):
    return jnp.dot(y, w.astype(y.dtype),
                   preferred_element_type=jnp.float32).astype(y.dtype)


def _pe_rope(x, cfg: TransformerConfig, positions=None):
    """RoPE on the decoupled rope dims, honoring cfg.rope_interleave.

    Half-split (llama rotate_half, default) pairs dims (i, i+d/2);
    interleaved (HF DeepseekV3 rope_interleave=True) pairs (2i, 2i+1).
    The interleaved form is computed by de-interleaving into half-split
    layout, applying the shared rotation, and re-interleaving — exact,
    and it keeps one rotation implementation."""
    theta, pscale = cfg.rope_params()

    def base(xx):
        if positions is None:
            return _rope(xx, theta, pscale)
        return _rope_at_1h(xx, positions, theta, pscale)

    if not cfg.rope_interleave:
        return base(x)
    half = x.shape[-1] // 2
    xe = jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)
    r = base(xe)
    return jnp.stack([r[..., :half], r[..., half:]], axis=-1).reshape(x.shape)


def _project_q(y, p, cfg: TransformerConfig):
    """y (B,S,d) -> (q_nope (B,h,S,nope), q_pe (B,h,S,rope)), pre-rope."""
    h, qk, nope, _, _, _ = mla_dims(cfg)
    if cfg.q_lora_rank:
        cq = rms_norm(_mm(y, p["w_dq"]), p["q_norm"], cfg.norm_eps)
        q = _mm(cq, p["w_uq"])
    else:
        q = _mm(y, p["w_q"])
    b, s, _ = y.shape
    q = q.reshape(b, s, h, qk).transpose(0, 2, 1, 3)
    return q[..., :nope], q[..., nope:]


def _project_latent(y, p, cfg: TransformerConfig):
    """y (B,S,d) -> (c_kv (B,S,d_c) RMS-normed, k_pe (B,1,S,rope) pre-rope)."""
    _, _, _, rope, _, d_c = mla_dims(cfg)
    ckv = _mm(y, p["w_dkv"])
    c = rms_norm(ckv[..., :d_c], p["kv_norm"], cfg.norm_eps)
    k_pe = ckv[..., d_c:][:, None]  # one shared rope head
    return c, k_pe


def mla_attention(y, p, cfg: TransformerConfig):
    """Expanded-form causal MLA over a full sequence (training path).

    y: (B, S, d) normed block input.  Returns the post-wo projection
    output (B, S, d) fp32 (wo goes through _mm_with_lora, so output-proj
    LoRA adapters apply to MLA blocks unchanged)."""
    from ..ops.attention import _sdpa_xla, causal_attention_fn

    h, qk, nope, rope, v_dim, d_c = mla_dims(cfg)
    b, s, dm = y.shape
    q_nope, q_pe = _project_q(y, p, cfg)
    c, k_pe = _project_latent(y, p, cfg)
    q_pe = _pe_rope(q_pe, cfg)
    k_pe = _pe_rope(k_pe, cfg)

    k_nope = _mm(c, p["w_uk"]).reshape(b, s, h, nope).transpose(0, 2, 1, 3)
    v = _mm(c, p["w_uv"]).reshape(b, s, h, v_dim).transpose(0, 2, 1, 3)
    q = jnp.concatenate([q_nope, q_pe], axis=-1)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (b, h, s, rope))], axis=-1)
    if v_dim == qk:
        # flash-kernel contract: equal head dims, scale = 1/sqrt(qk) —
        # holds by construction, so the fused Pallas path applies
        attn = causal_attention_fn(q, k, v)
    else:
        attn = _sdpa_xla(q, k, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * v_dim)
    return _mm_with_lora(attn, p["wo"], p, "wo")


# -- absorbed-form cached decode -----------------------------------------------


def init_mla_cache(cfg: TransformerConfig, batch: int, max_len: int):
    """Per-layer compressed cache: the RMS-normed latent + the shared rope
    key.  (kv_rank + rope) floats per position vs MHA's 2*h*head_dim."""
    _, _, _, rope, _, d_c = mla_dims(cfg)
    return [
        {
            "ckv": jnp.zeros((batch, max_len, d_c), cfg.act_dtype),
            "kpe": jnp.zeros((batch, max_len, rope), cfg.act_dtype),
        }
        for _ in range(cfg.n_layers)
    ]


def _rope_at_1h(x, positions, theta, pscale):
    """generate._rope_at for (B, H, T, D) with explicit positions."""
    from .generate import _rope_at

    return _rope_at(x, positions, theta, pscale)


def mla_attend_cached(y, p, layer_cache, start_pos, cfg: TransformerConfig):
    """Absorbed-form MLA over T new tokens at absolute start_pos.

    Scores dot q (pre-absorbed through w_uk) against the latent cache;
    values re-expand through w_uv only AFTER the probability-weighted
    latent sum — the full K/V never exist.  Returns (o (B,T,d) fp32,
    new_layer_cache)."""
    h, qk, nope, rope, v_dim, d_c = mla_dims(cfg)
    b, t, dm = y.shape
    max_len = layer_cache["ckv"].shape[1]
    positions = start_pos + jnp.arange(t)

    q_nope, q_pe = _project_q(y, p, cfg)
    q_pe = _pe_rope(q_pe, cfg, positions)
    c, k_pe = _project_latent(y, p, cfg)
    k_pe = _pe_rope(k_pe, cfg, positions)[:, 0]  # (B,T,rope)

    zero = jnp.int32(0)
    sp = start_pos.astype(jnp.int32)
    ckv = jax.lax.dynamic_update_slice(layer_cache["ckv"],
                                       c.astype(cfg.act_dtype),
                                       (zero, sp, zero))
    kpe = jax.lax.dynamic_update_slice(layer_cache["kpe"],
                                       k_pe.astype(cfg.act_dtype),
                                       (zero, sp, zero))

    # absorb w_uk into q: q_abs[b,h,t,c] = sum_n q_nope[.n] * w_uk[c,(h,n)]
    w_uk = p["w_uk"].reshape(d_c, h, nope)
    q_abs = jnp.einsum("bhtn,chn->bhtc", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32))
    scale = jnp.float32(1.0 / math.sqrt(qk))
    s = jnp.einsum("bhtc,blc->bhtl", q_abs, ckv.astype(jnp.float32))
    s = s + jnp.einsum("bhtr,blr->bhtl", q_pe.astype(jnp.float32),
                       kpe.astype(jnp.float32))
    s = s * scale
    q_pos = positions[:, None]
    l_pos = jnp.arange(max_len)[None, :]
    s = jnp.where(l_pos <= q_pos, s, jnp.float32(-1e30))
    prob = jax.nn.softmax(s, axis=-1)
    ol = jnp.einsum("bhtl,blc->bhtc", prob, ckv.astype(jnp.float32))
    w_uv = p["w_uv"].reshape(d_c, h, v_dim)
    out = jnp.einsum("bhtc,chv->bthv", ol, w_uv.astype(jnp.float32))
    out = out.reshape(b, t, h * v_dim).astype(y.dtype)
    o = _mm_with_lora(out, p["wo"], p, "wo")
    return o, {"ckv": ckv, "kpe": kpe}


def mla_block_with_cache(x, p, layer_cache, start_pos,
                         cfg: TransformerConfig):
    """Full MLA block (attention + MLP residual) for the decode path —
    the generate._block_with_cache shape, dispatched on cfg.attention."""
    y = apply_norm(x, p, "attn_norm", cfg)
    o, new_cache = mla_attend_cached(y, p, layer_cache, start_pos, cfg)
    if cfg.parallel_residual:
        y = apply_norm(x, p, "mlp_norm", cfg)
        return x + o.astype(x.dtype) + mlp(y, p, cfg).astype(x.dtype), new_cache
    x = x + o.astype(x.dtype)
    y = apply_norm(x, p, "mlp_norm", cfg)
    return x + mlp(y, p, cfg).astype(x.dtype), new_cache


def _pe_rope_perslot(x, cfg: TransformerConfig, positions):
    """_pe_rope for one token per slot at per-slot absolute positions:
    x (B, H, 1, D), positions (B,) -> same shape, each batch row rotated
    at its own position (the serving layout, where slots run unrelated
    sequences)."""
    return jax.vmap(
        lambda xx, pos: _pe_rope(xx[None], cfg, pos[None])[0])(x, positions)


def mla_attend_cached_perslot(y, p, layer_cache, positions,
                              cfg: TransformerConfig):
    """Absorbed-form MLA decode of ONE token per slot.

    y (B, 1, d) normed inputs, positions (B,) per-slot absolute positions
    (continuous batching: every slot is a different sequence).  Scatters
    this step's latent/rope-key into each slot's cache row at its own
    position, scores against the slot's latent history with a per-slot
    causal mask, and re-expands values after the weighted sum — the
    serving counterpart of mla_attend_cached (which assumes one shared
    start_pos).  Returns (o (B, 1, d) fp32, new_layer_cache)."""
    h, qk, nope, rope, v_dim, d_c = mla_dims(cfg)
    b = y.shape[0]
    max_len = layer_cache["ckv"].shape[1]
    pos = jnp.minimum(positions.astype(jnp.int32), max_len - 1)

    q_nope, q_pe = _project_q(y, p, cfg)  # (B, h, 1, nope/rope)
    q_pe = _pe_rope_perslot(q_pe, cfg, pos)
    c, k_pe = _project_latent(y, p, cfg)  # c (B,1,d_c), k_pe (B,1,1,rope)
    k_pe = _pe_rope_perslot(k_pe, cfg, pos)[:, 0]  # (B, 1, rope)

    bi = jnp.arange(b)
    ckv = layer_cache["ckv"].at[bi, pos].set(
        c[:, 0].astype(layer_cache["ckv"].dtype))
    kpe = layer_cache["kpe"].at[bi, pos].set(
        k_pe[:, 0].astype(layer_cache["kpe"].dtype))

    w_uk = p["w_uk"].reshape(d_c, h, nope)
    q_abs = jnp.einsum("bhtn,chn->bhtc", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32))
    s = jnp.einsum("bhtc,blc->bhtl", q_abs, ckv.astype(jnp.float32))
    s = s + jnp.einsum("bhtr,blr->bhtl", q_pe.astype(jnp.float32),
                       kpe.astype(jnp.float32))
    s = s * jnp.float32(1.0 / math.sqrt(qk))
    l_pos = jnp.arange(max_len)[None, None, None, :]  # (1,1,1,L)
    s = jnp.where(l_pos <= pos[:, None, None, None], s, jnp.float32(-1e30))
    prob = jax.nn.softmax(s, axis=-1)
    ol = jnp.einsum("bhtl,blc->bhtc", prob, ckv.astype(jnp.float32))
    w_uv = p["w_uv"].reshape(d_c, h, v_dim)
    out = jnp.einsum("bhtc,chv->bthv", ol, w_uv.astype(jnp.float32))
    out = out.reshape(b, 1, h * v_dim).astype(y.dtype)
    o = _mm_with_lora(out, p["wo"], p, "wo")
    return o, {"ckv": ckv, "kpe": kpe}
