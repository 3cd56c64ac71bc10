"""Vision encoder + multimodal (image-conditioned) language model.

The reference declares its operator scope "focused solely on multimodal
transformers" (/root/reference/README.md:2) but ships no models; this
module completes the family: a ViT-style patch encoder and an
image-prefixed causal LM built from the same rms_norm/SwiGLU/attention
primitives as models/transformer.py.

TPU-first choices:
  * patch embedding is reshape + one matmul (MXU-native) — no conv needed:
    non-overlapping patches are exactly a block reshape.
  * encoder attention is bidirectional SDPA (fp32 softmax via XLA — the
    encoder's S is small; the causal Pallas flash kernel keeps serving the
    decoder, where S is long).
  * the multimodal decoder is a PREFIX design: projected patch embeddings
    are prepended to the token sequence and the whole sequence runs through
    the causal decoder (prefix positions attend causally too — this keeps
    the flash-attention kernel's mask contract; the loss is masked to text
    positions).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .transformer import TransformerConfig, _block, _init_linear, rms_norm


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 64
    patch_size: int = 8
    channels: int = 3
    d_model: int = 256
    n_heads: int = 4
    n_layers: int = 4
    d_ff: int = 512
    dtype: str = "bfloat16"

    @property
    def n_patches(self) -> int:
        assert self.image_size % self.patch_size == 0
        return (self.image_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return self.patch_size * self.patch_size * self.channels

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)


def init_vit_params(key, cfg: ViTConfig):
    keys = jax.random.split(key, cfg.n_layers * 6 + 3)
    params = {
        "patch_proj": _init_linear(keys[0], cfg.patch_dim, cfg.d_model),
        "pos_embed": jax.random.normal(keys[1], (cfg.n_patches, cfg.d_model), jnp.float32)
        * 0.02,
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "blocks": [],
    }
    for i in range(cfg.n_layers):
        k = jax.random.split(keys[2 + i], 6)
        params["blocks"].append(
            {
                "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
                "wqkv": _init_linear(k[0], cfg.d_model, 3 * cfg.d_model),
                "wo": _init_linear(k[1], cfg.d_model, cfg.d_model),
                "mlp_norm": jnp.ones((cfg.d_model,), jnp.float32),
                "w_gate": _init_linear(k[2], cfg.d_model, cfg.d_ff),
                "w_up": _init_linear(k[3], cfg.d_model, cfg.d_ff),
                "w_down": _init_linear(k[4], cfg.d_ff, cfg.d_model),
            }
        )
    return params


def patchify(images, cfg: ViTConfig):
    """(B, H, W, C) -> (B, N, patch_dim) by pure block reshape."""
    b, hh, ww, c = images.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    x = images.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, C)
    return x.reshape(b, gh * gw, p * p * c)


def _encoder_block(x, p, cfg, mask=None):
    """Bidirectional attention + SwiGLU MLP (pre-norm).  `mask` (B, S)
    bool marks VALID key positions (None = all valid) — padding tokens
    neither receive attention nor contribute keys (models/encoder.py
    text path; ViT passes no mask)."""
    b, s, dm = x.shape
    h, hd = cfg.n_heads, cfg.head_dim

    y = rms_norm(x, p["attn_norm"])
    qkv = jnp.dot(y, p["wqkv"].astype(y.dtype), preferred_element_type=jnp.float32)
    qkv = qkv.astype(y.dtype).reshape(b, s, 3, h, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    scale = 1.0 / math.sqrt(hd)
    sc = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if mask is not None:
        sc = jnp.where(mask[:, None, None, :], sc, jnp.float32(-1e30))
    prob = jax.nn.softmax(sc, axis=-1)
    attn = jnp.einsum("bhqk,bhkd->bhqd", prob, v.astype(jnp.float32)).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, dm)
    x = x + jnp.dot(
        attn, p["wo"].astype(attn.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)

    y = rms_norm(x, p["mlp_norm"])
    gate = jnp.dot(y, p["w_gate"].astype(y.dtype), preferred_element_type=jnp.float32)
    up = jnp.dot(y, p["w_up"].astype(y.dtype), preferred_element_type=jnp.float32)
    act = (jax.nn.silu(gate) * up).astype(y.dtype)
    x = x + jnp.dot(
        act, p["w_down"].astype(act.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return x


def vit_encode(params, images, cfg: ViTConfig):
    """images (B, H, W, C) float -> patch features (B, N, d_model)."""
    x = patchify(images, cfg).astype(cfg.act_dtype)
    x = jnp.dot(
        x, params["patch_proj"].astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(cfg.act_dtype)
    x = x + params["pos_embed"].astype(x.dtype)
    for p in params["blocks"]:
        x = _encoder_block(x, p, cfg)
    return rms_norm(x, params["final_norm"])


# ---------------------------------------------------------------------------
# multimodal: image-prefixed causal LM
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MultimodalConfig:
    vit: ViTConfig = ViTConfig()
    text: TransformerConfig = TransformerConfig(
        vocab_size=512, d_model=256, n_heads=4, n_layers=4, d_ff=512
    )


def init_multimodal_params(key, cfg: MultimodalConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    from .transformer import init_params as init_text

    return {
        "vit": init_vit_params(k1, cfg.vit),
        "text": init_text(k2, cfg.text),
        "img_proj": _init_linear(k3, cfg.vit.d_model, cfg.text.d_model),
    }


def multimodal_forward(params, images, tokens, cfg: MultimodalConfig):
    """images (B, H, W, C), tokens (B, T) -> logits (B, T, vocab) over the
    TEXT positions (the image prefix's logits are dropped)."""
    tcfg = cfg.text
    feats = vit_encode(params["vit"], images, cfg.vit)  # (B, N, dv)
    prefix = jnp.dot(
        feats, params["img_proj"].astype(feats.dtype), preferred_element_type=jnp.float32
    ).astype(tcfg.act_dtype)  # (B, N, dt)
    tok_emb = params["text"]["embed"][tokens].astype(tcfg.act_dtype)  # (B, T, dt)
    x = jnp.concatenate([prefix, tok_emb], axis=1)  # (B, N+T, dt)
    for p in params["text"]["blocks"]:
        x = _block(x, p, tcfg)
    x = rms_norm(x, params["text"]["final_norm"])
    n = cfg.vit.n_patches
    logits = jnp.dot(
        x[:, n:], params["text"]["embed"].T.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return logits


def multimodal_loss(params, images, tokens, targets, cfg: MultimodalConfig):
    logits = multimodal_forward(params, images, tokens, cfg)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)
