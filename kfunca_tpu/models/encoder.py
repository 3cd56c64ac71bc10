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

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)


def init_encoder_params(key, cfg: EncoderConfig):
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


def encode(params, tokens, cfg: EncoderConfig, valid=None):
    """tokens (B, S) int32, valid (B, S) bool or None -> (B, S, d_model).
    Padding (valid=False) positions are excluded from every attention."""
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
