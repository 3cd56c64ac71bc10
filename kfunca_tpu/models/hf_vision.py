"""HF ViT checkpoint import: the original pre-norm LayerNorm/GELU ViT.

The native ViT (models/vision.py) is TPU-first (RMSNorm/SwiGLU, no CLS
token, matmul patch embedding); this module carries the faithful HF
`ViTModel` architecture (Dosovitskiy et al.) so pretrained vision
checkpoints load directly: CLS token + learned positions over N+1 slots,
pre-norm LayerNorm blocks with biased qkv / output projections, exact
(erf by default "gelu") GELU MLP, a final LayerNorm, and the tanh CLS
pooler.  The conv patch embedding is imported as a matmul — a stride-p
patch conv IS a block-reshape matmul, so the TPU path stays MXU-native
(weight reorder (d,C,p,p) -> (p,p,C,d)).

No reference analog (the reference `/root/reference` ships no models);
green-field like the rest of the model zoo.  Parity: tests pin
last_hidden_state and pooler_output against transformers' ViTModel.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .transformer import layer_norm


@dataclass(frozen=True)
class HFViTConfig:
    image_size: int = 224
    patch_size: int = 16
    channels: int = 3
    d_model: int = 768
    n_heads: int = 12
    n_layers: int = 12
    d_ff: int = 3072
    norm_eps: float = 1e-12
    dtype: str = "float32"

    @property
    def n_patches(self) -> int:
        assert self.image_size % self.patch_size == 0
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)


def _patchify(images, cfg: HFViTConfig):
    """(B, H, W, C) -> (B, N, p*p*C) block reshape, pixel-major (pr, pc, c)
    ordering — the order the imported conv weight is transposed into."""
    b, hh, ww, c = images.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    x = images.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, p * p * c)


def _hf_vit_block(x, p, cfg: HFViTConfig):
    """Pre-norm HF ViT block: ln -> biased MHA -> +x; ln -> GELU MLP -> +."""
    b, s, dm = x.shape
    h, hd = cfg.n_heads, cfg.head_dim
    y = layer_norm(x, p["attn_norm"], p["attn_norm_b"], cfg.norm_eps)
    qkv = jnp.dot(y, p["wqkv"].astype(y.dtype),
                  preferred_element_type=jnp.float32) + p["bqkv"]
    qkv = qkv.astype(y.dtype).reshape(b, s, 3, h, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    sc = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (1.0 / math.sqrt(hd))
    prob = jax.nn.softmax(sc, axis=-1)
    attn = jnp.einsum("bhqk,bhkd->bhqd", prob,
                      v.astype(jnp.float32)).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, dm)
    o = jnp.dot(attn, p["wo"].astype(attn.dtype),
                preferred_element_type=jnp.float32) + p["bo"]
    x = x + o.astype(x.dtype)

    y = layer_norm(x, p["mlp_norm"], p["mlp_norm_b"], cfg.norm_eps)
    hdn = jnp.dot(y, p["w_fc"].astype(y.dtype),
                  preferred_element_type=jnp.float32) + p["b_fc"]
    act = jax.nn.gelu(hdn, approximate=False).astype(y.dtype)
    out = jnp.dot(act, p["w_proj"].astype(act.dtype),
                  preferred_element_type=jnp.float32) + p["b_proj"]
    return x + out.astype(x.dtype)


def hf_vit_encode(params, images, cfg: HFViTConfig):
    """images (B, H, W, C) float -> (B, N+1, d) — matches HF ViTModel's
    last_hidden_state (slot 0 is the CLS token)."""
    x = _patchify(images.astype(cfg.act_dtype), cfg)
    x = jnp.dot(x, params["patch_w"].astype(x.dtype),
                preferred_element_type=jnp.float32) + params["patch_b"]
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls"].astype(jnp.float32),
                           (b, 1, cfg.d_model))
    x = jnp.concatenate([cls, x], axis=1)
    x = (x + params["pos_embed"]).astype(cfg.act_dtype)
    for p in params["blocks"]:
        x = _hf_vit_block(x, p, cfg)
    return layer_norm(x, params["final_norm"], params["final_norm_b"],
                      cfg.norm_eps)


def hf_vit_pooled(params, images, cfg: HFViTConfig):
    """HF ViTModel.pooler_output: tanh(dense(CLS hidden))."""
    x = hf_vit_encode(params, images, cfg)
    cls = x[:, 0].astype(jnp.float32)
    return jnp.tanh(cls @ params["pooler_w"] + params["pooler_b"])


def from_hf_vit(model, dtype: str = "float32"):
    """(params, cfg) from a transformers ViTModel (or a wrapper exposing
    .vit).  The conv patch projection (d, C, p, p) is reordered to a
    (p*p*C, d) matmul aligned with _patchify's (pr, pc, c) pixel order."""
    import numpy as np

    hf = getattr(model, "vit", model)
    hc = hf.config
    if getattr(hc, "hidden_act", "gelu") != "gelu":
        raise NotImplementedError(f"ViT activation {hc.hidden_act!r}")
    if not getattr(hc, "qkv_bias", True):
        raise NotImplementedError("qkv_bias=False ViT variants")
    cfg = HFViTConfig(
        image_size=hc.image_size, patch_size=hc.patch_size,
        channels=hc.num_channels, d_model=hc.hidden_size,
        n_heads=hc.num_attention_heads, n_layers=hc.num_hidden_layers,
        d_ff=hc.intermediate_size, norm_eps=float(hc.layer_norm_eps),
        dtype=dtype,
    )
    sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}

    def W(name):  # HF (out, in) -> ours (in, out)
        return jnp.asarray(np.ascontiguousarray(sd[name].T))

    def A(name):
        return jnp.asarray(sd[name])

    pw = sd["embeddings.patch_embeddings.projection.weight"]  # (d,C,p,p)
    patch_w = jnp.asarray(
        np.ascontiguousarray(np.transpose(pw, (2, 3, 1, 0)).reshape(
            cfg.patch_size * cfg.patch_size * cfg.channels, cfg.d_model)))
    params = {
        "patch_w": patch_w,
        "patch_b": A("embeddings.patch_embeddings.projection.bias"),
        "cls": A("embeddings.cls_token").reshape(1, cfg.d_model),
        "pos_embed": A("embeddings.position_embeddings")[0],
        "final_norm": A("layernorm.weight"),
        "final_norm_b": A("layernorm.bias"),
        "blocks": [],
    }
    if "pooler.dense.weight" in sd:
        params["pooler_w"] = W("pooler.dense.weight")
        params["pooler_b"] = A("pooler.dense.bias")
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}."
        params["blocks"].append({
            "wqkv": jnp.concatenate(
                [W(p + f"attention.attention.{n}.weight")
                 for n in ("query", "key", "value")], axis=1),
            "bqkv": jnp.concatenate(
                [A(p + f"attention.attention.{n}.bias")
                 for n in ("query", "key", "value")]),
            "wo": W(p + "attention.output.dense.weight"),
            "bo": A(p + "attention.output.dense.bias"),
            "attn_norm": A(p + "layernorm_before.weight"),
            "attn_norm_b": A(p + "layernorm_before.bias"),
            "w_fc": W(p + "intermediate.dense.weight"),
            "b_fc": A(p + "intermediate.dense.bias"),
            "w_proj": W(p + "output.dense.weight"),
            "b_proj": A(p + "output.dense.bias"),
            "mlp_norm": A(p + "layernorm_after.weight"),
            "mlp_norm_b": A(p + "layernorm_after.bias"),
        })
    return params, cfg
