"""LoRA finetuning: train low-rank adapters on a frozen base model.

Green-field capability (the reference `/root/reference` has no training
loop, let alone parameter-efficient finetuning); completes the repo's LoRA
story — `models/serve.py` already decodes with per-request multi-LoRA
adapters, this module is where those adapters come from.

Design (Hu et al., "LoRA: Low-Rank Adaptation of Large Language Models"):
every targeted weight W (d_in, d_out) gains a delta scale * A @ B with
A (d_in, r) Gaussian / sqrt(r) and B (r, d_out) ZEROS — the adapted model
starts exactly at the base model.  scale = alpha / r by convention.

TPU realization: the adapted forward computes x @ W + scale * (x @ A) @ B
— two skinny fp32 matmuls per target (transformer._lora_delta), never a
materialized W + AB.  Gradients flow ONLY through the adapter tree: the
train step closes over the frozen base, so autodiff never allocates base-
weight cotangents and the optimizer state is O(adapter) — the whole point
of the method (a rank-8 adapter on a 7B model is ~0.1% of the weights).

Workflow:
    ad = init_lora(key, cfg, rank=8, targets=("wqkv",))
    step = make_lora_train_step(params, cfg, OptConfig(weight_decay=0.0))
    opt = init_opt_state(ad["blocks"])
    ad, opt, loss = jax.jit(step)(ad, opt, tokens, targets)
    merged = merge_lora(params, ad)         # plain params: generate/to_hf
    srv.register_lora(to_serving(ad))       # paged multi-LoRA decode

MoE blocks: adapters target the attention matrices (wqkv/wo) only — the
routed experts stay frozen (per-expert adapters would multiply the adapter
count by n_experts for little finetuning benefit; the router is
routing-critical and deliberately untouched).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.errors import check
from .train import OptConfig, apply_update
from .transformer import TransformerConfig, loss_fn, loss_fn_chunked

# target name -> (d_in, d_out) resolver
_TARGET_DIMS = {
    "wqkv": lambda cfg: (cfg.d_model, cfg.qkv_out),
    "wo": lambda cfg: (cfg.d_model, cfg.d_model),
    "w_gate": lambda cfg: (cfg.d_model, cfg.d_ff),
    "w_up": lambda cfg: (cfg.d_model, cfg.d_ff),
    "w_down": lambda cfg: (cfg.d_ff, cfg.d_model),
}


def init_lora(key, cfg: TransformerConfig, rank: int = 8,
              targets: tuple = ("wqkv",), alpha: float | None = None):
    """Adapter pytree: {"blocks": [{name: {"A", "B"}}], "scale": float}.
    Targets are implicit in the block keys (jit-friendly: no string leaves).
    B is zeros so the delta starts at 0; scale defaults to the
    conventional alpha/r with alpha=r (scale 1.0)."""
    for t in targets:
        check(t in _TARGET_DIMS, f"unknown LoRA target {t!r} "
              f"(supported: {sorted(_TARGET_DIMS)})")
        if cfg.n_experts and t in ("w_gate", "w_up", "w_down"):
            raise NotImplementedError(
                "LoRA on MoE expert MLPs is not supported; target the "
                "attention matrices (wqkv, wo) on MoE configs")
    scale = 1.0 if alpha is None else alpha / rank
    blocks = []
    for li in range(cfg.n_layers):
        blk = {}
        for t in targets:
            d_in, _d_out = _TARGET_DIMS[t](cfg)
            t_id = sorted(_TARGET_DIMS).index(t)  # stable across processes
            k = jax.random.fold_in(jax.random.fold_in(key, li), t_id)
            blk[t] = {
                "A": jax.random.normal(k, (d_in, rank), jnp.float32)
                / jnp.sqrt(jnp.float32(rank)),
                "B": jnp.zeros((rank, _d_out), jnp.float32),
            }
        blocks.append(blk)
    return {"blocks": blocks, "scale": scale}


def _adapter_leaves(adapters):
    """The trainable sub-tree (per-block A/B dicts) — scale/targets are
    static metadata, not parameters."""
    return adapters["blocks"]


def attach_lora(params, adapters):
    """Return params whose blocks carry a "lora" subdict consumed by
    transformer._lora_delta.  Shallow: base weights are shared, not
    copied; the result is a valid params tree for forward/loss_fn."""
    scale = adapters["scale"]
    out = dict(params)
    out["blocks"] = [
        {**blk, "lora": {t: {**ab, "scale": scale} for t, ab in ad.items()}}
        for blk, ad in zip(params["blocks"], adapters["blocks"])
    ]
    return out


def merge_lora(params, adapters):
    """Fold the adapters into plain base-format params:
    W <- W + scale * A @ B (cast to W's dtype).  Use for dense
    generation, HF export, or serving without adapter slots."""
    scale = jnp.float32(adapters["scale"])
    out = dict(params)
    blocks = []
    for blk, ad in zip(params["blocks"], adapters["blocks"]):
        blk = dict(blk)
        for t, ab in ad.items():
            delta = scale * jnp.dot(ab["A"], ab["B"],
                                    preferred_element_type=jnp.float32)
            blk[t] = (blk[t].astype(jnp.float32) + delta).astype(blk[t].dtype)
        blocks.append(blk)
    out["blocks"] = blocks
    return out


def to_serving(adapters):
    """Per-layer [{"A", "B"}] for InferenceServer.register_lora (which
    supports wqkv adapters; scale is folded into B so the server's
    unscaled A @ B delta matches the training-time forward)."""
    targets = sorted({t for blk in adapters["blocks"] for t in blk})
    check("wqkv" in targets, "serving adapters require the 'wqkv' target")
    if targets != ["wqkv"]:
        raise NotImplementedError(
            "InferenceServer.register_lora supports wqkv-only adapters; "
            f"got targets {targets} — merge_lora instead")
    s = jnp.float32(adapters["scale"])
    return [{"A": ad["wqkv"]["A"], "B": ad["wqkv"]["B"] * s}
            for ad in adapters["blocks"]]


def quantize_base(params, bits: int = 8):
    """QLoRA: quantize the FROZEN base's block matrices to (intN, scale)
    pairs — int8 per-column (quantize_cols) or int4 group-wise
    (quantize_cols_int4).  The training forward dequantizes transiently
    per matmul (transformer._plain_mm), so resident base memory drops
    ~4x (int8) / ~8x (int4) vs fp32 masters while gradients (adapters
    only) flow through unchanged fp32 math.  Embeddings, norms, and the
    (tied) LM head stay fp — the loss path needs full precision and they
    are a small fraction of the weights.  Use with make_lora_train_step /
    make_lora_dpo_step; merge trained adapters onto the ORIGINAL fp
    checkpoint (merge_lora) for serving/export."""
    from ..ops.quant import quantize_cols, quantize_cols_int4

    if bits == 8:
        quant = quantize_cols
    elif bits == 4:
        def quant(w):
            k = w.shape[0]
            g = next((g for g in (128, 64, 32, 16, 8, 4, 2) if k % g == 0), k)
            return quantize_cols_int4(w, group=g)
    else:
        raise ValueError(f"unsupported bits {bits} (8 or 4)")

    def qblk(blk):
        out = {}
        for k, v in blk.items():
            if k in ("wqkv", "wo", "w_gate", "w_up", "w_down",
                     "w_fc", "w_proj"):
                out[k] = quant(v)
            elif k == "experts":
                out[k] = [{n: quant(w) for n, w in ex.items()} for ex in v]
            else:
                out[k] = v
        return out

    out = dict(params)
    out["blocks"] = [qblk(b) for b in params["blocks"]]
    return out


def make_lora_train_step(base_params, cfg: TransformerConfig,
                         oc: OptConfig = OptConfig(weight_decay=0.0),
                         loss_chunk: int | None = None,
                         ignore_index: int | None = None):
    """Returns step(adapters, opt_state, tokens, targets) ->
    (adapters, opt_state, loss); jit it yourself.  The base params are
    closed over as frozen constants: value_and_grad runs over the adapter
    blocks only, so grads, optimizer moments, and updates are all
    O(adapter size).  Build opt_state over the trainable sub-tree:
    init_opt_state(adapters["blocks"]) — scale/targets are static
    metadata, not parameters."""
    if loss_chunk is None:
        def loss(p, tokens, tgts):
            return loss_fn(p, tokens, tgts, cfg, ignore_index=ignore_index)
    else:
        def loss(p, tokens, tgts):
            return loss_fn_chunked(p, tokens, tgts, cfg, loss_chunk,
                                   ignore_index=ignore_index)

    def step(adapters, opt_state, tokens, tgts):
        scale = adapters["scale"]

        def loss_of_blocks(blocks):
            p = attach_lora(base_params, {"blocks": blocks, "scale": scale})
            return loss(p, tokens, tgts)

        loss_v, grads = jax.value_and_grad(loss_of_blocks)(adapters["blocks"])
        new_blocks, opt_state = apply_update(
            adapters["blocks"], grads, opt_state, oc)
        return {"blocks": new_blocks, "scale": scale}, opt_state, loss_v

    return step
