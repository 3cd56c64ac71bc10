"""Bidirectional text encoder: masked-LM pretraining + sentence embeddings.

Completes the encoder half of the "multimodal transformers" scope the
reference declares (/root/reference/README.md:2): models/vision.py is the
image encoder, models/clip.py the contrastive pair — this is the BERT-
family text side (Devlin et al.): bidirectional blocks over learned
positions, the 80/10/10 masked-token objective, and mean-pooled unit-norm
sentence embeddings.

TPU-first choices:
  * the encoder reuses vision._encoder_block (pre-norm RMSNorm -> full
    bidirectional SDPA -> SwiGLU) with a (B, S) validity mask — padding
    positions neither attend nor contribute keys, and the pooled
    embedding averages only valid positions;
  * the MLM head is the tied embedding transpose streamed through the
    chunked-vocab cross-entropy (models/loss.py) — (B, S, V) logits are
    never materialized, and non-masked positions carry ignore_index so
    they contribute no loss and no gradient;
  * masking is stateless in (key, batch): `mlm_corrupt` is pure, so data
    pipelines replay exactly under the Trainer's step-indexed resume.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .loss import chunked_softmax_xent
from .transformer import _init_linear, rms_norm
from .vision import _encoder_block

IGNORE = -100


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 1024
    d_model: int = 256
    n_heads: int = 4
    n_layers: int = 4
    d_ff: int = 512
    max_seq_len: int = 128
    dtype: str = "bfloat16"
    mask_token: int = 1  # the [MASK] id (BERT convention: a reserved id)
    # architecture: "preln" (RMSNorm -> SDPA -> SwiGLU, the TPU-first
    # default) | "bert" (the original post-norm LayerNorm/GELU stack with
    # token-type embeddings and biased projections — the layout HF BERT
    # checkpoints import into, see from_hf_bert)
    arch: str = "preln"
    type_vocab: int = 0  # token-type ("segment") vocabulary (BERT: 2)
    norm_eps: float = 1e-12  # LayerNorm eps for arch="bert" (HF default)

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)


def init_encoder_params(key, cfg: EncoderConfig):
    if cfg.arch == "bert":
        # encode() dispatches on cfg.arch, so init must match: the bert
        # layout needs embed_norm/token-type/biased projections that the
        # preln pytree below lacks (a mismatch only surfaces as a KeyError
        # deep inside bert_encode).
        return init_bert_params(key, cfg)
    assert cfg.arch == "preln", cfg.arch
    keys = jax.random.split(key, cfg.n_layers * 5 + 2)
    params = {
        "embed": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.d_model), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(
            keys[1], (cfg.max_seq_len, cfg.d_model), jnp.float32) * 0.01,
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "blocks": [],
    }
    for i in range(cfg.n_layers):
        k = keys[2 + i * 5 : 2 + (i + 1) * 5]
        params["blocks"].append({
            "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "wqkv": _init_linear(k[0], cfg.d_model, 3 * cfg.d_model),
            "wo": _init_linear(k[1], cfg.d_model, cfg.d_model),
            "mlp_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "w_gate": _init_linear(k[2], cfg.d_model, cfg.d_ff),
            "w_up": _init_linear(k[3], cfg.d_model, cfg.d_ff),
            "w_down": _init_linear(k[4], cfg.d_ff, cfg.d_model),
        })
    return params


def encode(params, tokens, cfg: EncoderConfig, valid=None, token_type=None):
    """tokens (B, S) int32, valid (B, S) bool or None -> (B, S, d_model).
    Padding (valid=False) positions are excluded from every attention.
    `token_type` (B, S) int32 segment ids apply only to arch="bert"."""
    if cfg.arch == "bert":
        return bert_encode(params, tokens, cfg, valid, token_type)
    s = tokens.shape[1]
    x = params["embed"][tokens].astype(cfg.act_dtype)
    x = x + params["pos_embed"][:s].astype(cfg.act_dtype)
    for p in params["blocks"]:
        x = _encoder_block(x, p, cfg, mask=valid)
    return rms_norm(x, params["final_norm"])


def embed_pooled(params, tokens, cfg: EncoderConfig, valid=None):
    """Mean-pooled unit-norm sentence embeddings (B, d_model) fp32 —
    the sentence-transformers readout; padding excluded from the mean."""
    x = encode(params, tokens, cfg, valid).astype(jnp.float32)
    if valid is None:
        pooled = jnp.mean(x, axis=1)
    else:
        w = valid.astype(jnp.float32)[..., None]
        pooled = jnp.sum(x * w, axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), 1.0)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-8)


def mlm_corrupt(key, tokens, cfg: EncoderConfig, mask_prob: float = 0.15):
    """BERT 80/10/10 corruption.  Returns (inputs, targets): targets hold
    the ORIGINAL token at selected positions and IGNORE elsewhere; inputs
    replace selected positions with [MASK] (80%), a random token (10%),
    or keep the original (10%).  Pure in (key, tokens) — replayable."""
    k1, k2, k3 = jax.random.split(key, 3)
    sel = jax.random.uniform(k1, tokens.shape) < mask_prob
    targets = jnp.where(sel, tokens, IGNORE)
    u = jax.random.uniform(k2, tokens.shape)
    rand_tok = jax.random.randint(k3, tokens.shape, 0, cfg.vocab_size,
                                  tokens.dtype)
    inputs = jnp.where(
        sel & (u < 0.8), jnp.asarray(cfg.mask_token, tokens.dtype),
        jnp.where(sel & (u >= 0.9), rand_tok, tokens))
    return inputs, targets


def mlm_loss(params, inputs, targets, cfg: EncoderConfig, valid=None,
             vocab_chunk: int = 1024):
    """Mean NLL over target != IGNORE positions; tied-embedding head
    streamed in vocab chunks (no (B, S, V) materialization)."""
    x = encode(params, inputs, cfg, valid)
    b, s, d = x.shape
    flat_t = targets.reshape(-1).astype(jnp.int32)
    mask = (flat_t != IGNORE).astype(jnp.float32)
    safe = jnp.where(flat_t == IGNORE, 0, flat_t)
    head = jnp.transpose(params["embed"])  # (d, V) tied
    nll = chunked_softmax_xent(x.reshape(-1, d), head, safe, vocab_chunk)
    denom = jnp.maximum(jnp.sum(mask), jnp.float32(1.0))
    return jnp.sum(nll * mask) / denom


def make_mlm_train_step(cfg: EncoderConfig, oc=None,
                        mask_prob: float = 0.15, vocab_chunk: int = 1024):
    """step(params, opt_state, key, tokens, valid=None) -> (params,
    opt_state, loss); corruption is drawn from `key` inside the step
    (fold a step counter in for replayable schedules)."""
    from .train import OptConfig, apply_update

    oc = oc or OptConfig(lr=3e-4, weight_decay=0.01)

    def step(params, opt_state, key, tokens, valid=None):
        inputs, targets = mlm_corrupt(key, tokens, cfg, mask_prob)

        def loss_fn(p):
            return mlm_loss(p, inputs, targets, cfg, valid, vocab_chunk)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# BERT-family (post-norm) architecture + HF import
# ---------------------------------------------------------------------------
#
# The original BERT stack (Devlin et al.; HF modeling_bert): learned
# word + position + token-type embeddings through a LayerNorm, then
# post-norm blocks — LayerNorm AFTER each residual add — with biased
# projections and exact (erf) GELU.  Kept as a second EncoderConfig arch
# so HF BERT checkpoints (sentence encoders, rerankers, classifiers)
# import directly; scratch pretraining on TPU should prefer the default
# pre-norm arch (better-conditioned at depth, RMSNorm kernel contract).


def _bert_block(x, p, cfg: EncoderConfig, mask=None):
    """Post-norm BERT block.  `mask` (B, S) bool marks VALID keys."""
    import math as _math

    from .transformer import layer_norm

    b, s, dm = x.shape
    h, hd = cfg.n_heads, cfg.head_dim

    qkv = jnp.dot(x, p["wqkv"].astype(x.dtype),
                  preferred_element_type=jnp.float32) + p["bqkv"]
    qkv = qkv.astype(x.dtype).reshape(b, s, 3, h, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    sc = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (1.0 / _math.sqrt(hd))
    if mask is not None:
        sc = jnp.where(mask[:, None, None, :], sc, jnp.float32(-1e30))
    prob = jax.nn.softmax(sc, axis=-1)
    attn = jnp.einsum("bhqk,bhkd->bhqd", prob,
                      v.astype(jnp.float32)).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, dm)
    o = jnp.dot(attn, p["wo"].astype(attn.dtype),
                preferred_element_type=jnp.float32) + p["bo"]
    x = layer_norm(x + o.astype(x.dtype), p["attn_norm"], p["attn_norm_b"],
                   cfg.norm_eps)

    hdn = jnp.dot(x, p["w_fc"].astype(x.dtype),
                  preferred_element_type=jnp.float32) + p["b_fc"]
    act = jax.nn.gelu(hdn, approximate=False).astype(x.dtype)  # erf GELU
    out = jnp.dot(act, p["w_proj"].astype(act.dtype),
                  preferred_element_type=jnp.float32) + p["b_proj"]
    return layer_norm(x + out.astype(x.dtype), p["mlp_norm"],
                      p["mlp_norm_b"], cfg.norm_eps)


def bert_encode(params, tokens, cfg: EncoderConfig, valid=None,
                token_type=None):
    """tokens (B, S) -> last hidden states (B, S, d) — matches HF
    BertModel.last_hidden_state.  token_type defaults to segment 0."""
    from .transformer import layer_norm

    s = tokens.shape[1]
    x = params["embed"][tokens] + params["pos_embed"][:s]
    if cfg.type_vocab:
        tt = (jnp.zeros_like(tokens) if token_type is None else token_type)
        x = x + params["type_embed"][tt]
    x = layer_norm(x.astype(jnp.float32), params["embed_norm"],
                   params["embed_norm_b"], cfg.norm_eps)
    x = x.astype(cfg.act_dtype)
    for p in params["blocks"]:
        x = _bert_block(x, p, cfg, mask=valid)
    return x


def bert_pooled(params, tokens, cfg: EncoderConfig, valid=None,
                token_type=None):
    """HF BertModel.pooler_output: tanh(dense([CLS] hidden))."""
    x = bert_encode(params, tokens, cfg, valid, token_type)
    cls = x[:, 0].astype(jnp.float32)
    return jnp.tanh(cls @ params["pooler_w"] + params["pooler_b"])


def init_bert_params(key, cfg: EncoderConfig):
    """Scratch init for arch="bert" (HF initializer_range=0.02 style)."""
    assert cfg.arch == "bert"
    keys = jax.random.split(key, cfg.n_layers * 6 + 4)
    n = lambda k, shape, s=0.02: jax.random.normal(k, shape, jnp.float32) * s
    params = {
        "embed": n(keys[0], (cfg.vocab_size, cfg.d_model)),
        "pos_embed": n(keys[1], (cfg.max_seq_len, cfg.d_model)),
        "embed_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "embed_norm_b": jnp.zeros((cfg.d_model,), jnp.float32),
        "pooler_w": n(keys[2], (cfg.d_model, cfg.d_model)),
        "pooler_b": jnp.zeros((cfg.d_model,), jnp.float32),
        "blocks": [],
    }
    if cfg.type_vocab:
        params["type_embed"] = n(keys[3], (cfg.type_vocab, cfg.d_model))
    for i in range(cfg.n_layers):
        k = keys[4 + i * 6 : 4 + (i + 1) * 6]
        params["blocks"].append({
            "wqkv": n(k[0], (cfg.d_model, 3 * cfg.d_model)),
            "bqkv": jnp.zeros((3 * cfg.d_model,), jnp.float32),
            "wo": n(k[1], (cfg.d_model, cfg.d_model)),
            "bo": jnp.zeros((cfg.d_model,), jnp.float32),
            "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "attn_norm_b": jnp.zeros((cfg.d_model,), jnp.float32),
            "w_fc": n(k[2], (cfg.d_model, cfg.d_ff)),
            "b_fc": jnp.zeros((cfg.d_ff,), jnp.float32),
            "w_proj": n(k[3], (cfg.d_ff, cfg.d_model)),
            "b_proj": jnp.zeros((cfg.d_model,), jnp.float32),
            "mlp_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "mlp_norm_b": jnp.zeros((cfg.d_model,), jnp.float32),
        })
    return params


def from_hf_bert(model, dtype: str = "float32"):
    """(params, cfg) from a transformers BertModel (or a wrapper exposing
    .bert).  Maps HF keys: embeddings.{word,position,token_type}_embeddings
    + LayerNorm, encoder.layer.N.attention.self.{query,key,value} /
    attention.output.dense+LayerNorm / intermediate.dense / output.dense+
    LayerNorm, pooler.dense."""
    import numpy as _np_mod

    hf = getattr(model, "bert", model)
    hc = hf.config
    act = getattr(hc, "hidden_act", "gelu")
    if act != "gelu":
        raise NotImplementedError(f"BERT activation {act!r} (erf gelu only)")
    cfg = EncoderConfig(
        vocab_size=hc.vocab_size, d_model=hc.hidden_size,
        n_heads=hc.num_attention_heads, n_layers=hc.num_hidden_layers,
        d_ff=hc.intermediate_size, max_seq_len=hc.max_position_embeddings,
        dtype=dtype, arch="bert", type_vocab=hc.type_vocab_size,
        norm_eps=float(hc.layer_norm_eps),
    )
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in hf.state_dict().items()}

    def W(name):  # HF (out, in) -> ours (in, out)
        return jnp.asarray(_np_mod.ascontiguousarray(sd[name].T))

    def A(name):
        return jnp.asarray(sd[name])

    params = {
        "embed": A("embeddings.word_embeddings.weight"),
        "pos_embed": A("embeddings.position_embeddings.weight"),
        "type_embed": A("embeddings.token_type_embeddings.weight"),
        "embed_norm": A("embeddings.LayerNorm.weight"),
        "embed_norm_b": A("embeddings.LayerNorm.bias"),
        "blocks": [],
    }
    if "pooler.dense.weight" in sd:
        params["pooler_w"] = W("pooler.dense.weight")
        params["pooler_b"] = A("pooler.dense.bias")
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}."
        params["blocks"].append({
            "wqkv": jnp.concatenate(
                [W(p + f"attention.self.{n}.weight")
                 for n in ("query", "key", "value")], axis=1),
            "bqkv": jnp.concatenate(
                [A(p + f"attention.self.{n}.bias")
                 for n in ("query", "key", "value")]),
            "wo": W(p + "attention.output.dense.weight"),
            "bo": A(p + "attention.output.dense.bias"),
            "attn_norm": A(p + "attention.output.LayerNorm.weight"),
            "attn_norm_b": A(p + "attention.output.LayerNorm.bias"),
            "w_fc": W(p + "intermediate.dense.weight"),
            "b_fc": A(p + "intermediate.dense.bias"),
            "w_proj": W(p + "output.dense.weight"),
            "b_proj": A(p + "output.dense.bias"),
            "mlp_norm": A(p + "output.LayerNorm.weight"),
            "mlp_norm_b": A(p + "output.LayerNorm.bias"),
        })
    return params, cfg
