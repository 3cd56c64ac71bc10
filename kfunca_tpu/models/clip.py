"""CLIP-style dual-encoder contrastive training (image <-> text alignment).

Completes the "multimodal transformers" scope the reference declares
(/root/reference/README.md:2) on the training side: models/vision.py gives
generative image-conditioned LM; this module gives the contrastive
representation learner (Radford et al., "Learning Transferable Visual
Models From Natural Language Supervision").

Design:
  * dual encoders — the ViT patch encoder (mean-pooled) and the causal
    text trunk (last-position feature, the autoregressive summary state) —
    each projected to a shared embed_dim and L2-normalized;
  * symmetric InfoNCE over the batch: logits = exp(logit_scale) * I @ T^T,
    cross-entropy against the diagonal both ways; logit_scale is a LEARNED
    log-temperature initialized to log(1/0.07) and clamped at exp <= 100
    (the CLIP recipe);
  * TPU scale-out (`clip_loss_sharded`): contrastive quality depends on
    the GLOBAL batch of negatives, so under data parallelism each device
    all_gathers the (tiny, already-projected) embedding matrices over the
    dp axis and contrasts its LOCAL examples against the GLOBAL set —
    (b, e) all_gathers ride ICI, the (B_global, B_global) logit matrix is
    never materialized on one device (each chip holds b x B_global), and
    label offsets come from the device's axis_index.  Gradients flow
    through the gathered copies via all_gather's transpose (psum_scatter),
    matching the exact single-device global-batch loss — pinned by test.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .transformer import TransformerConfig, hidden_states, _init_linear
from .vision import ViTConfig, init_vit_params, vit_encode

MAX_LOGIT_SCALE = math.log(100.0)  # CLIP clamp: temperature >= 1/100


@dataclass(frozen=True)
class ClipConfig:
    vit: ViTConfig = ViTConfig()
    text: TransformerConfig = TransformerConfig(
        vocab_size=512, d_model=256, n_heads=4, n_layers=4, d_ff=512
    )
    embed_dim: int = 128


def init_clip_params(key, cfg: ClipConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    from .transformer import init_params as init_text

    return {
        "vit": init_vit_params(k1, cfg.vit),
        "text": init_text(k2, cfg.text),
        "img_head": _init_linear(k3, cfg.vit.d_model, cfg.embed_dim),
        "txt_head": _init_linear(k4, cfg.text.d_model, cfg.embed_dim),
        # learned log-temperature (CLIP init: log(1/0.07))
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }


def _normalize(x):
    x = x.astype(jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def encode_image(params, images, cfg: ClipConfig):
    """(B, H, W, C) -> unit-norm (B, embed_dim) fp32."""
    feats = vit_encode(params["vit"], images, cfg.vit)  # (B, N, dv)
    pooled = jnp.mean(feats.astype(jnp.float32), axis=1)
    return _normalize(jnp.dot(pooled, params["img_head"],
                              preferred_element_type=jnp.float32))


def encode_text(params, tokens, cfg: ClipConfig):
    """(B, T) int32 -> unit-norm (B, embed_dim) fp32.  Uses the final
    position's trunk state (causal attention makes it the sequence
    summary, the standard CLIP-text readout position)."""
    x = hidden_states(params["text"], tokens, cfg.text)  # (B, T, dt)
    last = x[:, -1].astype(jnp.float32)
    return _normalize(jnp.dot(last, params["txt_head"],
                              preferred_element_type=jnp.float32))


def _scale(params):
    return jnp.exp(jnp.minimum(params["logit_scale"], MAX_LOGIT_SCALE))


def _xent_rows(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def clip_loss(params, images, tokens, cfg: ClipConfig):
    """Single-device symmetric InfoNCE; returns (loss, metrics)."""
    img = encode_image(params, images, cfg)
    txt = encode_text(params, tokens, cfg)
    logits = _scale(params) * jnp.dot(img, txt.T,
                                      preferred_element_type=jnp.float32)
    labels = jnp.arange(img.shape[0], dtype=jnp.int32)
    li = jnp.mean(_xent_rows(logits, labels))        # image -> text
    lt = jnp.mean(_xent_rows(logits.T, labels))      # text -> image
    loss = 0.5 * (li + lt)
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels)
                   .astype(jnp.float32))
    return loss, {"acc_i2t": jax.lax.stop_gradient(acc),
                  "logit_scale": jax.lax.stop_gradient(_scale(params))}


def clip_loss_sharded(params, images, tokens, cfg: ClipConfig,
                      axis_name: str = "dp"):
    """Global-batch InfoNCE inside a shard_map/pjit manual region over
    `axis_name`: local encoders, all_gathered (b, e) embeddings as the
    negative set, labels offset by the device's axis index.  Numerically
    identical to clip_loss on the concatenated global batch (same logit
    matrix rows, psum-averaged) — pinned in tests/test_clip.py."""
    img = encode_image(params, images, cfg)   # (b, e) local
    txt = encode_text(params, tokens, cfg)
    b = img.shape[0]
    # tiled=True -> (n_dev*b, e); gradients flow back via the transpose
    img_all = jax.lax.all_gather(img, axis_name, tiled=True)
    txt_all = jax.lax.all_gather(txt, axis_name, tiled=True)
    scale = _scale(params)
    labels = jax.lax.axis_index(axis_name) * b + jnp.arange(b, dtype=jnp.int32)
    # local rows vs global columns: (b, B_global) — never (B, B) per chip
    li = _xent_rows(scale * jnp.dot(img, txt_all.T,
                                    preferred_element_type=jnp.float32),
                    labels)
    lt = _xent_rows(scale * jnp.dot(txt, img_all.T,
                                    preferred_element_type=jnp.float32),
                    labels)
    # mean over the GLOBAL batch
    loss = jax.lax.pmean(jnp.mean(0.5 * (li + lt)), axis_name)
    return loss


def make_clip_train_step(cfg: ClipConfig, oc=None):
    """step(params, opt_state, images, tokens) -> (params, opt_state,
    metrics) — single-device; jit it yourself.  For data-parallel global
    negatives, build the step inside shard_map with clip_loss_sharded."""
    from .train import OptConfig, apply_update

    oc = oc or OptConfig(lr=1e-4, weight_decay=0.0)

    def step(params, opt_state, images, tokens):
        def loss_fn(p):
            return clip_loss(p, images, tokens, cfg)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, {"loss": loss, **metrics}

    return step
