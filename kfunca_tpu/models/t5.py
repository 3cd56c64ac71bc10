"""T5-family encoder-decoder: seq2seq training, cached generation, HF parity.

The missing architecture class in the model zoo: every other family here is
decoder-only or encoder-only.  This adds the full encoder-decoder stack —
bidirectional encoder, causal decoder with CROSS-ATTENTION over the encoder
output, and T5's signature position scheme: no absolute positions at all,
just a learned bucketed RELATIVE bias added to self-attention scores
(computed once per stack, shared by every layer).

Covers both T5 generations:
  * original T5 (Raffel et al. 2020): ReLU MLP (wi -> relu -> wo),
    tied embeddings with the d_model**-0.5 logit rescale;
  * t5-v1.1 / Flan-T5: gated-GELU MLP (wi_0 gelu * wi_1 -> wo), untied
    lm_head.
plus the quirks HF parity forces: NO 1/sqrt(d) score scaling (folded into
init by the T5 recipe), d_kv independent of d_model/n_heads (v1.1-small has
n_heads*d_kv != d_model), RMSNorm (T5LayerNorm) everywhere, cross-attention
bias-free.

TPU-first construction mirrors the flagship (models/transformer.py): pure
params pytree, fp32 params / configurable activation dtype, fp32 softmax
and matmul accumulation, static shapes only.  Attention runs as plain XLA
SDPA einsums rather than the flash kernels: the relative bias is an
additive (H, Sq, Skv) score term the flash kernels don't take, and at
T5-family depths XLA's fusion of QK^T + bias + softmax + PV is already
HBM-efficient.  Generation precomputes the cross-attention K/V once and
scans one compiled decode step with a dynamic_update_slice self-attention
cache (models/generate.py pattern).

Reference scope: /root/reference/README.md:2 declares "multimodal
transformers" but ships no model; the HF oracle is
transformers.T5ForConditionalGeneration (tests/test_t5.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .transformer import _init_linear, _masked_mean, rms_norm

IGNORE = -100


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 512
    d_model: int = 256
    n_heads: int = 4
    # T5 decouples the per-head width from d_model (HF d_kv): the attention
    # inner width is n_heads * d_kv, NOT necessarily d_model (v1.1-small:
    # d_model=512, 6 heads x 64 = 384).
    d_kv: int = 64
    d_ff: int = 512
    n_enc_layers: int = 4
    n_dec_layers: int = 4
    dtype: str = "bfloat16"  # activation dtype; params stay fp32
    norm_eps: float = 1e-6
    # relative position bias (shared across a stack's layers, self-attn only)
    rel_buckets: int = 32
    rel_max_distance: int = 128
    # "relu" (original T5) | "gated-gelu" (v1.1 / Flan-T5)
    mlp_type: str = "relu"
    # tied: logits = (x * d_model**-0.5) @ embed.T (the HF T5 rescale);
    # untied: a separate "lm_head" param (v1.1 convention)
    tied_head: bool = True
    decoder_start_id: int = 0  # HF decoder_start_token_id (= pad for T5)
    pad_id: int = 0

    @property
    def inner_dim(self) -> int:
        return self.n_heads * self.d_kv

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def _init_attn(key, cfg: T5Config):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "wq": _init_linear(kq, cfg.d_model, cfg.inner_dim),
        "wk": _init_linear(kk, cfg.d_model, cfg.inner_dim),
        "wv": _init_linear(kv, cfg.d_model, cfg.inner_dim),
        "wo": _init_linear(ko, cfg.inner_dim, cfg.d_model),
    }


def _init_mlp(key, cfg: T5Config):
    k0, k1, k2 = jax.random.split(key, 3)
    if cfg.mlp_type == "gated-gelu":
        return {
            "wi_0": _init_linear(k0, cfg.d_model, cfg.d_ff),
            "wi_1": _init_linear(k1, cfg.d_model, cfg.d_ff),
            "wo": _init_linear(k2, cfg.d_ff, cfg.d_model),
        }
    return {
        "wi": _init_linear(k0, cfg.d_model, cfg.d_ff),
        "wo": _init_linear(k2, cfg.d_ff, cfg.d_model),
    }


def init_t5_params(key, cfg: T5Config):
    keys = jax.random.split(key, 4)
    params = {
        "embed": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.d_model), jnp.float32),
        # (rel_buckets, n_heads) bias tables, one per stack (HF keeps them
        # on block 0's self-attention; shared by every layer of the stack)
        "enc_rel_bias": jax.random.normal(
            jax.random.fold_in(keys[1], 0),
            (cfg.rel_buckets, cfg.n_heads), jnp.float32) * 0.1,
        "dec_rel_bias": jax.random.normal(
            jax.random.fold_in(keys[1], 1),
            (cfg.rel_buckets, cfg.n_heads), jnp.float32) * 0.1,
        "enc_final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "dec_final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "encoder": [],
        "decoder": [],
    }
    if not cfg.tied_head:
        params["lm_head"] = _init_linear(keys[2], cfg.d_model, cfg.vocab_size)
    for i in range(cfg.n_enc_layers):
        k = jax.random.fold_in(keys[3], i)
        ka, km = jax.random.split(k)
        params["encoder"].append({
            "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "attn": _init_attn(ka, cfg),
            "mlp_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "mlp": _init_mlp(km, cfg),
        })
    for i in range(cfg.n_dec_layers):
        k = jax.random.fold_in(keys[3], 1000 + i)
        ka, kc, km = jax.random.split(k, 3)
        params["decoder"].append({
            "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "attn": _init_attn(ka, cfg),
            "cross_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "cross": _init_attn(kc, cfg),
            "mlp_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "mlp": _init_mlp(km, cfg),
        })
    return params


# ---------------------------------------------------------------------------
# relative position bias
# ---------------------------------------------------------------------------


def relative_position_bucket(rel, bidirectional: bool, num_buckets: int = 32,
                             max_distance: int = 128):
    """T5's bucketing of relative positions (rel = key_pos - query_pos):
    half the buckets cover exact small offsets, the other half log-spaced
    offsets out to max_distance; bidirectional stacks split the range by
    sign.  Traceable (jnp) — matches HF _relative_position_bucket exactly
    (pinned vs the transformers oracle in tests/test_t5.py)."""
    rel = rel.astype(jnp.int32)
    ret = jnp.zeros_like(rel)
    n = num_buckets
    if bidirectional:
        n = n // 2
        ret = ret + (rel > 0).astype(jnp.int32) * jnp.int32(n)
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    # log-spaced large-offset buckets; rel clamped >=1 keeps log finite for
    # the positions that take the is_small branch anyway
    relf = jnp.maximum(rel.astype(jnp.float32), 1.0)
    large = max_exact + (
        jnp.log(relf / max_exact)
        / math.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, jnp.int32(n - 1))
    return ret + jnp.where(is_small, rel, large)


def _rel_bias(table, q_pos, k_pos, bidirectional: bool, cfg: T5Config):
    """(H, Tq, Tk) fp32 additive score bias from the (buckets, H) table."""
    rel = k_pos[None, :] - q_pos[:, None]  # (Tq, Tk)
    bucket = relative_position_bucket(
        rel, bidirectional, cfg.rel_buckets, cfg.rel_max_distance)
    return table[bucket].transpose(2, 0, 1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# attention / blocks
# ---------------------------------------------------------------------------


def _heads(x, cfg: T5Config):
    b, s, _ = x.shape
    return x.reshape(b, s, cfg.n_heads, cfg.d_kv).transpose(0, 2, 1, 3)


def _mm(y, w):
    return jnp.dot(y, w.astype(y.dtype), preferred_element_type=jnp.float32)


def _attend(q, k, v, bias, mask):
    """SDPA WITHOUT the 1/sqrt(d) scale (the T5 contract: scale is folded
    into initialization).  q/k/v (B,H,T,d); bias (H,Tq,Tk) fp32 or None;
    mask (B,1,Tq,Tk)-broadcastable bool (True = attend) or None."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    if bias is not None:
        s = s + bias[None]
    if mask is not None:
        s = jnp.where(mask, s, jnp.float32(-1e30))
    prob = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", prob, v.astype(jnp.float32))


def _attn_out(x, p, q_in, kv_in, bias, mask, cfg: T5Config):
    """One residual attention sub-layer: x + wo(attend(...)); q_in/kv_in
    are the normed inputs (kv_in differs for cross-attention)."""
    b, t, _ = q_in.shape
    q = _heads(_mm(q_in, p["wq"]).astype(q_in.dtype), cfg)
    k = _heads(_mm(kv_in, p["wk"]).astype(kv_in.dtype), cfg)
    v = _heads(_mm(kv_in, p["wv"]).astype(kv_in.dtype), cfg)
    attn = _attend(q, k, v, bias, mask).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.inner_dim)
    return x + _mm(attn, p["wo"]).astype(x.dtype)


def _mlp_out(x, p, cfg: T5Config):
    y = rms_norm(x, p["mlp_norm"], cfg.norm_eps)
    m = p["mlp"]
    if cfg.mlp_type == "gated-gelu":
        h = jax.nn.gelu(_mm(y, m["wi_0"]), approximate=True)
        act = (h * _mm(y, m["wi_1"])).astype(y.dtype)
    else:
        act = jax.nn.relu(_mm(y, m["wi"])).astype(y.dtype)
    return x + _mm(act, m["wo"]).astype(x.dtype)


def t5_encode(params, tokens, cfg: T5Config, valid=None):
    """tokens (B, S) int32, valid (B, S) bool or None -> (B, S, d_model).
    No absolute positions: T5's only position signal is the shared
    relative bias.  Padding neither attends nor contributes keys."""
    s = tokens.shape[1]
    x = params["embed"][tokens].astype(cfg.act_dtype)
    pos = jnp.arange(s)
    bias = _rel_bias(params["enc_rel_bias"], pos, pos, True, cfg)
    mask = None if valid is None else valid[:, None, None, :]
    for p in params["encoder"]:
        y = rms_norm(x, p["attn_norm"], cfg.norm_eps)
        x = _attn_out(x, p["attn"], y, y, bias, mask, cfg)
        x = _mlp_out(x, p, cfg)
    return rms_norm(x, params["enc_final_norm"], cfg.norm_eps)


def t5_decode(params, enc_out, dec_tokens, cfg: T5Config, enc_valid=None):
    """Teacher-forced decoder: causal self-attention (with the decoder's
    relative bias) + bias-free cross-attention over enc_out.
    Returns (B, T, d_model) before the head."""
    t = dec_tokens.shape[1]
    x = params["embed"][dec_tokens].astype(cfg.act_dtype)
    pos = jnp.arange(t)
    bias = _rel_bias(params["dec_rel_bias"], pos, pos, False, cfg)
    causal = (pos[None, :] <= pos[:, None])[None, None]  # (1,1,T,T)
    xmask = None if enc_valid is None else enc_valid[:, None, None, :]
    enc_out = enc_out.astype(cfg.act_dtype)
    for p in params["decoder"]:
        y = rms_norm(x, p["attn_norm"], cfg.norm_eps)
        x = _attn_out(x, p["attn"], y, y, bias, causal, cfg)
        y = rms_norm(x, p["cross_norm"], cfg.norm_eps)
        x = _attn_out(x, p["cross"], y, enc_out, None, xmask, cfg)
        x = _mlp_out(x, p, cfg)
    return rms_norm(x, params["dec_final_norm"], cfg.norm_eps)


def t5_head(params, x, cfg: T5Config):
    """(.., d_model) -> fp32 logits; tied heads apply T5's d_model**-0.5
    rescale (HF T5ForConditionalGeneration tie_word_embeddings path)."""
    if cfg.tied_head:
        x = x * jnp.asarray(cfg.d_model**-0.5, x.dtype)
        return jnp.dot(x, params["embed"].T.astype(x.dtype),
                       preferred_element_type=jnp.float32)
    return jnp.dot(x, params["lm_head"].astype(x.dtype),
                   preferred_element_type=jnp.float32)


def t5_forward(params, enc_tokens, dec_tokens, cfg: T5Config, enc_valid=None):
    """Full seq2seq forward -> (B, T, vocab) fp32 logits."""
    enc = t5_encode(params, enc_tokens, cfg, enc_valid)
    x = t5_decode(params, enc, dec_tokens, cfg, enc_valid)
    return t5_head(params, x, cfg)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def shift_right(labels, cfg: T5Config):
    """HF _shift_right: decoder inputs = [start_id, labels[:-1]], with
    IGNORE positions replaced by pad."""
    inp = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), cfg.decoder_start_id, labels.dtype),
         labels[:, :-1]], axis=1)
    return jnp.where(inp == IGNORE, jnp.asarray(cfg.pad_id, labels.dtype), inp)


def t5_loss(params, enc_tokens, labels, cfg: T5Config, enc_valid=None):
    """Token-mean NLL with teacher forcing; labels == IGNORE masked out."""
    dec_in = shift_right(labels, cfg)
    logits = t5_forward(params, enc_tokens, dec_in, cfg, enc_valid)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.maximum(labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, labels, IGNORE)


def make_t5_train_step(cfg: T5Config, oc=None):
    """step(params, opt_state, enc_tokens, labels, enc_valid=None) ->
    (params, opt_state, loss); optimizer zoo via models/train.py."""
    from .train import OptConfig, apply_update

    oc = oc or OptConfig(lr=1e-3)

    def step(params, opt_state, enc_tokens, labels, enc_valid=None):
        loss, grads = jax.value_and_grad(t5_loss)(
            params, enc_tokens, labels, cfg, enc_valid)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# generation (cached)
# ---------------------------------------------------------------------------


def _precompute_cross_kv(params, enc_out, cfg: T5Config):
    """Cross-attention K/V depend only on the encoder output — compute
    once per request, reuse every decode step (the enc-dec analog of the
    decoder-only KV cache's prefill)."""
    out = []
    for p in params["decoder"]:
        c = p["cross"]
        out.append({
            "k": _heads(_mm(enc_out, c["wk"]).astype(enc_out.dtype), cfg),
            "v": _heads(_mm(enc_out, c["wv"]).astype(enc_out.dtype), cfg),
        })
    return out


def _decode_step(params, x, caches, cross_kv, pos, enc_mask, cfg: T5Config):
    """One decoder token at absolute position `pos` (traced scalar):
    self-attn against the dynamic_update_slice cache + cross-attn against
    the precomputed K/V.  Returns (hidden (B,1,d), new caches)."""
    max_len = caches[0]["k"].shape[2]
    kpos = jnp.arange(max_len)
    bias = _rel_bias(params["dec_rel_bias"], pos[None], kpos, False, cfg)
    smask = (kpos <= pos)[None, None, None, :]
    new_caches = []
    for p, cache, ckv in zip(params["decoder"], caches, cross_kv):
        y = rms_norm(x, p["attn_norm"], cfg.norm_eps)
        a = p["attn"]
        q = _heads(_mm(y, a["wq"]).astype(y.dtype), cfg)
        k = _heads(_mm(y, a["wk"]).astype(y.dtype), cfg)
        v = _heads(_mm(y, a["wv"]).astype(y.dtype), cfg)
        zero = jnp.int32(0)
        idx = (zero, zero, pos.astype(jnp.int32), zero)
        kc = jax.lax.dynamic_update_slice(cache["k"], k, idx)
        vc = jax.lax.dynamic_update_slice(cache["v"], v, idx)
        new_caches.append({"k": kc, "v": vc})
        attn = _attend(q, kc, vc, bias, smask).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(x.shape[0], 1, cfg.inner_dim)
        x = x + _mm(attn, a["wo"]).astype(x.dtype)

        y = rms_norm(x, p["cross_norm"], cfg.norm_eps)
        q = _heads(_mm(y, p["cross"]["wq"]).astype(y.dtype), cfg)
        attn = _attend(q, ckv["k"], ckv["v"], None, enc_mask).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(x.shape[0], 1, cfg.inner_dim)
        x = x + _mm(attn, p["cross"]["wo"]).astype(x.dtype)

        x = _mlp_out(x, p, cfg)
    return rms_norm(x, params["dec_final_norm"], cfg.norm_eps), new_caches


def t5_generate(params, enc_tokens, cfg: T5Config, max_new_tokens: int = 32,
                eos_id: int = 1, enc_valid=None):
    """Greedy encoder-decoder generation: ONE compiled program (encoder +
    cross-KV precompute + a lax.scan of single-token decode steps).
    Returns (B, max_new_tokens) int32; positions after EOS hold pad_id."""
    b = enc_tokens.shape[0]
    max_len = max_new_tokens + 1

    @jax.jit
    def run(params, enc_tokens, enc_valid):
        enc = t5_encode(params, enc_tokens, cfg, enc_valid)
        cross_kv = _precompute_cross_kv(params, enc, cfg)
        enc_mask = (None if enc_valid is None
                    else enc_valid[:, None, None, :])
        caches = [
            {"k": jnp.zeros((b, cfg.n_heads, max_len, cfg.d_kv),
                            cfg.act_dtype),
             "v": jnp.zeros((b, cfg.n_heads, max_len, cfg.d_kv),
                            cfg.act_dtype)}
            for _ in range(cfg.n_dec_layers)
        ]
        tok0 = jnp.full((b,), cfg.decoder_start_id, jnp.int32)

        def step(carry, i):
            tok, caches, done = carry
            x = params["embed"][tok[:, None]].astype(cfg.act_dtype)
            h, caches = _decode_step(
                params, x, caches, cross_kv, i, enc_mask, cfg)
            logits = t5_head(params, h[:, 0], cfg)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out = jnp.where(done, jnp.int32(cfg.pad_id), nxt)
            done = done | (nxt == eos_id)
            return (out, caches, done), out

        (_, _, _), toks = jax.lax.scan(
            step, (tok0, caches, jnp.zeros((b,), bool)),
            jnp.arange(max_new_tokens))
        return toks.T  # (B, T)

    return run(params, enc_tokens, enc_valid)


# ---------------------------------------------------------------------------
# HuggingFace interop (T5ForConditionalGeneration)
# ---------------------------------------------------------------------------


def config_from_hf_t5(hf_config, dtype: str = "bfloat16") -> T5Config:
    """Map a transformers T5Config onto T5Config.  feed_forward_proj
    "relu" -> relu MLP, "gated-gelu" -> the v1.1 gated MLP."""
    g = (lambda k, d=None: hf_config.get(k, d)) if isinstance(
        hf_config, dict) else (lambda k, d=None: getattr(hf_config, k, d))
    proj = g("feed_forward_proj", "relu")
    if proj not in ("relu", "gated-gelu"):
        raise NotImplementedError(f"feed_forward_proj={proj!r}")
    return T5Config(
        vocab_size=g("vocab_size"),
        d_model=g("d_model"),
        n_heads=g("num_heads"),
        d_kv=g("d_kv"),
        d_ff=g("d_ff"),
        n_enc_layers=g("num_layers"),
        n_dec_layers=g("num_decoder_layers", g("num_layers")),
        dtype=dtype,
        norm_eps=g("layer_norm_epsilon", 1e-6),
        rel_buckets=g("relative_attention_num_buckets", 32),
        rel_max_distance=g("relative_attention_max_distance", 128),
        mlp_type=proj,
        tied_head=bool(g("tie_word_embeddings", True)),
        decoder_start_id=g("decoder_start_token_id", 0) or 0,
        pad_id=g("pad_token_id", 0) or 0,
    )


def _hf_attn_params(sd, prefix):
    """HF {q,k,v,o}.weight (out, in) -> our (in, out) attn dict."""
    from .hf import _np

    return {
        "wq": jnp.asarray(_np(sd[f"{prefix}.q.weight"]).T),
        "wk": jnp.asarray(_np(sd[f"{prefix}.k.weight"]).T),
        "wv": jnp.asarray(_np(sd[f"{prefix}.v.weight"]).T),
        "wo": jnp.asarray(_np(sd[f"{prefix}.o.weight"]).T),
    }


def _hf_mlp_params(sd, prefix, cfg: T5Config):
    from .hf import _np

    if cfg.mlp_type == "gated-gelu":
        return {
            "wi_0": jnp.asarray(_np(sd[f"{prefix}.wi_0.weight"]).T),
            "wi_1": jnp.asarray(_np(sd[f"{prefix}.wi_1.weight"]).T),
            "wo": jnp.asarray(_np(sd[f"{prefix}.wo.weight"]).T),
        }
    return {
        "wi": jnp.asarray(_np(sd[f"{prefix}.wi.weight"]).T),
        "wo": jnp.asarray(_np(sd[f"{prefix}.wo.weight"]).T),
    }


def params_from_hf_t5(state_dict, cfg: T5Config):
    """T5ForConditionalGeneration state_dict -> our params pytree (fp32).
    Relative bias tables live on block 0's self-attention in HF; every
    Linear transposes (out, in) -> (in, out)."""
    from .hf import _np

    sd = state_dict
    params = {
        "embed": jnp.asarray(_np(sd["shared.weight"])),
        "enc_rel_bias": jnp.asarray(_np(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"])),
        "dec_rel_bias": jnp.asarray(_np(
            sd["decoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"])),
        "enc_final_norm": jnp.asarray(_np(sd["encoder.final_layer_norm.weight"])),
        "dec_final_norm": jnp.asarray(_np(sd["decoder.final_layer_norm.weight"])),
        "encoder": [],
        "decoder": [],
    }
    if not cfg.tied_head:
        params["lm_head"] = jnp.asarray(_np(sd["lm_head.weight"]).T)
    for i in range(cfg.n_enc_layers):
        b = f"encoder.block.{i}"
        params["encoder"].append({
            "attn_norm": jnp.asarray(_np(sd[f"{b}.layer.0.layer_norm.weight"])),
            "attn": _hf_attn_params(sd, f"{b}.layer.0.SelfAttention"),
            "mlp_norm": jnp.asarray(_np(sd[f"{b}.layer.1.layer_norm.weight"])),
            "mlp": _hf_mlp_params(sd, f"{b}.layer.1.DenseReluDense", cfg),
        })
    for i in range(cfg.n_dec_layers):
        b = f"decoder.block.{i}"
        params["decoder"].append({
            "attn_norm": jnp.asarray(_np(sd[f"{b}.layer.0.layer_norm.weight"])),
            "attn": _hf_attn_params(sd, f"{b}.layer.0.SelfAttention"),
            "cross_norm": jnp.asarray(_np(sd[f"{b}.layer.1.layer_norm.weight"])),
            "cross": _hf_attn_params(sd, f"{b}.layer.1.EncDecAttention"),
            "mlp_norm": jnp.asarray(_np(sd[f"{b}.layer.2.layer_norm.weight"])),
            "mlp": _hf_mlp_params(sd, f"{b}.layer.2.DenseReluDense", cfg),
        })
    return params


def from_hf_t5(model_or_path, dtype: str = "bfloat16"):
    """(params, cfg) from a transformers T5 model instance or local path."""
    if isinstance(model_or_path, (str, bytes)) or hasattr(
            model_or_path, "__fspath__"):
        from transformers import T5ForConditionalGeneration

        model = T5ForConditionalGeneration.from_pretrained(model_or_path)
    else:
        model = model_or_path
    cfg = config_from_hf_t5(model.config, dtype=dtype)
    return params_from_hf_t5(model.state_dict(), cfg), cfg


def to_hf_t5(params, cfg: T5Config) -> dict:
    """Our pytree -> a T5ForConditionalGeneration state_dict (numpy fp32
    values, HF key names/orientations) for export."""
    import numpy as np

    sd = {"shared.weight": np.asarray(params["embed"], np.float32)}
    sd["encoder.embed_tokens.weight"] = sd["shared.weight"]
    sd["decoder.embed_tokens.weight"] = sd["shared.weight"]
    sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
       ".weight"] = np.asarray(params["enc_rel_bias"], np.float32)
    sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias"
       ".weight"] = np.asarray(params["dec_rel_bias"], np.float32)
    sd["encoder.final_layer_norm.weight"] = np.asarray(
        params["enc_final_norm"], np.float32)
    sd["decoder.final_layer_norm.weight"] = np.asarray(
        params["dec_final_norm"], np.float32)
    if not cfg.tied_head:
        sd["lm_head.weight"] = np.asarray(params["lm_head"], np.float32).T

    def put_attn(prefix, a):
        for ours, theirs in (("wq", "q"), ("wk", "k"), ("wv", "v"),
                             ("wo", "o")):
            sd[f"{prefix}.{theirs}.weight"] = np.asarray(
                a[ours], np.float32).T

    def put_mlp(prefix, m):
        for k in m:
            sd[f"{prefix}.{k}.weight"] = np.asarray(m[k], np.float32).T

    for i, p in enumerate(params["encoder"]):
        b = f"encoder.block.{i}"
        sd[f"{b}.layer.0.layer_norm.weight"] = np.asarray(
            p["attn_norm"], np.float32)
        put_attn(f"{b}.layer.0.SelfAttention", p["attn"])
        sd[f"{b}.layer.1.layer_norm.weight"] = np.asarray(
            p["mlp_norm"], np.float32)
        put_mlp(f"{b}.layer.1.DenseReluDense", p["mlp"])
    for i, p in enumerate(params["decoder"]):
        b = f"decoder.block.{i}"
        sd[f"{b}.layer.0.layer_norm.weight"] = np.asarray(
            p["attn_norm"], np.float32)
        put_attn(f"{b}.layer.0.SelfAttention", p["attn"])
        sd[f"{b}.layer.1.layer_norm.weight"] = np.asarray(
            p["cross_norm"], np.float32)
        put_attn(f"{b}.layer.1.EncDecAttention", p["cross"])
        sd[f"{b}.layer.2.layer_norm.weight"] = np.asarray(
            p["mlp_norm"], np.float32)
        put_mlp(f"{b}.layer.2.DenseReluDense", p["mlp"])
    return sd


# ---------------------------------------------------------------------------
# mesh parallelism (dp x tp)
# ---------------------------------------------------------------------------


def t5_param_specs(params, cfg: T5Config) -> dict:
    """Megatron-style TP sharding over the (dp, tp) mesh
    (parallel/mesh.py): q/k/v column-parallel (heads over tp), o
    row-parallel, MLP wi* column / wo row, relative-bias tables sharded
    over their head axis, norms replicated.  GSPMD inserts the
    all-reduces; forward parity is pinned on the 8-device CPU mesh
    (tests/test_t5.py::TestMesh)."""
    from jax.sharding import PartitionSpec as P

    def attn_spec():
        return {"wq": P(None, "tp"), "wk": P(None, "tp"),
                "wv": P(None, "tp"), "wo": P("tp", None)}

    def mlp_spec():
        if cfg.mlp_type == "gated-gelu":
            return {"wi_0": P(None, "tp"), "wi_1": P(None, "tp"),
                    "wo": P("tp", None)}
        return {"wi": P(None, "tp"), "wo": P("tp", None)}

    enc = [{"attn_norm": P(), "attn": attn_spec(), "mlp_norm": P(),
            "mlp": mlp_spec()} for _ in params["encoder"]]
    dec = [{"attn_norm": P(), "attn": attn_spec(), "cross_norm": P(),
            "cross": attn_spec(), "mlp_norm": P(), "mlp": mlp_spec()}
           for _ in params["decoder"]]
    out = {
        "embed": P(None, "tp"),
        "enc_rel_bias": P(None, "tp"),  # (buckets, H): heads follow tp
        "dec_rel_bias": P(None, "tp"),
        "enc_final_norm": P(),
        "dec_final_norm": P(),
        "encoder": enc,
        "decoder": dec,
    }
    if "lm_head" in params:
        out["lm_head"] = P(None, "tp")
    return out


def shard_t5_params(params, mesh, cfg: T5Config):
    from jax.sharding import NamedSharding

    specs = t5_param_specs(params, cfg)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)))
