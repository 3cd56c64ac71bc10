"""Flagship model family: decoder-only multimodal-style transformer LM.

The reference's operator scope is "focused solely on multimodal transformers"
(reference README.md:2) but ships no model; this is the capability those
operators exist to serve, built TPU-first:

  * pure-functional params pytree + jax transforms (grad/jit/sharding) —
    the model layer composes the same kernel library the eager Tensor API
    uses (flash causal attention fwd+bwd, MXU matmul), picked per backend.
  * bf16 compute / fp32 params & reductions (MXU-native mixed precision).
  * static shapes, `jax.checkpoint`-able blocks, shard_map/pjit-compatible:
    no data-dependent control flow anywhere.

Architecture: RMSNorm -> causal flash attention -> RMSNorm -> SwiGLU MLP,
rotary position embeddings, tied LM head.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.attention import causal_attention_fn


@dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 32000
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 4
    d_ff: int = 1408
    max_seq_len: int = 1024
    dtype: str = "bfloat16"  # activation/compute dtype; params stay fp32
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6  # RMSNorm epsilon (HF rms_norm_eps)
    # context extension beyond the trained window (factor > 1):
    #   "linear" — position interpolation (Chen et al. 2023): positions
    #     are divided by the factor, squeezing the extended range into the
    #     trained rotary band;
    #   "ntk" — NTK-aware base scaling: theta *= factor**(d/(d-2)), which
    #     stretches low frequencies while keeping high ones (often usable
    #     without finetuning).
    rope_scaling: float = 1.0
    rope_scaling_type: str = "linear"
    remat: bool = False  # jax.checkpoint each block (HBM <-> FLOPs trade)
    # GQA: number of K/V heads (None = n_heads, i.e. full MHA).  The KV
    # cache and wqkv shrink accordingly; the flash kernels read the shared
    # kv head through their index maps (zero extra compute).
    n_kv_heads: int | None = None
    # sliding-window attention (Mistral-style); None = full causal
    attention_window: int | None = None
    # Mixtral-style MoE: n_experts > 0 replaces the dense SwiGLU MLP with
    # a top-k routed mixture of n_experts SwiGLU experts (router softmax
    # over all experts, top-k weights renormalized — the HF Mixtral
    # convention).  0 = dense (default).
    n_experts: int = 0
    moe_top_k: int = 2
    # DeepSeek-family MoE extensions (V2/V3, HF modeling_deepseek_v3):
    #   n_shared_experts — always-on experts beside the routed set; stored
    #     as ONE dense SwiGLU "shared" with hidden n_shared * moe_d_ff
    #     (the HF DeepseekV3MoE.shared_experts layout)
    #   moe_d_ff — per-routed-expert hidden width (fine-grained experts,
    #     HF moe_intermediate_size); None = d_ff
    #   moe_score — router scoring: "softmax" (Mixtral) | "sigmoid" (V3)
    #   moe_norm_topk — renormalize the selected weights to sum 1
    #   moe_routed_scale — multiply routed weights (HF routed_scaling_factor)
    #   moe_n_group / moe_topk_group — group-limited routing: experts in
    #     n_group groups, selection restricted to the topk_group groups
    #     with the largest top-2-score sum (the V3 "noaux" device-limited
    #     routing)
    #   moe_score_bias — a per-expert bias ("router_bias", HF
    #     e_score_correction_bias) added for SELECTION only; the mixing
    #     weights stay the raw sigmoid scores
    #   moe_first_dense — the first k layers keep a dense MLP (HF
    #     first_k_dense_replace)
    n_shared_experts: int = 0
    moe_d_ff: int | None = None
    moe_score: str = "softmax"
    moe_norm_topk: bool = True
    moe_routed_scale: float = 1.0
    moe_n_group: int = 1
    moe_topk_group: int = 1
    moe_score_bias: bool = False
    moe_first_dense: int = 0
    # MLA rope pairing convention: False = half-split (llama rotate_half),
    # True = interleaved (x[2i], x[2i+1]) pairs — HF DeepseekV3 default
    # (config.rope_interleave).  Consumed only by models/mla.py.
    rope_interleave: bool = False
    # architecture family switches (GPT-2/OPT-style models):
    #   norm: "rms" (RMSNorm, no bias) | "layernorm" (mean-centered, with
    #     bias params <name>_b — the GPT-2/BERT convention)
    #   pos: "rope" (rotary) | "learned" (a trained (max_seq_len, d_model)
    #     "pos_embed" table added to the token embeddings)
    #   mlp_type: "swiglu" (w_gate/w_up/w_down) | "gelu" (w_fc -> tanh-GELU
    #     -> w_proj, the GPT-2 "gelu_new" MLP; optional b_fc/b_proj)
    #   proj_bias: init attention/MLP projection biases (bqkv, bo,
    #     b_fc/b_proj) — HF imports set these keys directly regardless
    norm: str = "rms"
    pos: str = "rope"
    mlp_type: str = "swiglu"
    proj_bias: bool = False
    # GPT-NeoX/Pythia-family switches:
    #   rope_pct: fraction of head_dim that rotates (HF rotary_pct;
    #     Pythia = 0.25 — the tail dims pass through unrotated)
    #   parallel_residual: x + attn(ln1(x)) + mlp(ln2(x)) computed from
    #     the SAME input (GPT-NeoX/GPT-J block) instead of sequentially
    #   gelu_exact: erf-based GELU (GPT-NeoX "gelu") instead of the
    #     tanh approximation (GPT-2 "gelu_new")
    rope_pct: float = 1.0
    parallel_residual: bool = False
    gelu_exact: bool = False
    # Qwen3/OLMo2-family: per-head RMSNorm on q and k (gain over head_dim,
    # params "q_norm"/"k_norm" per block) applied after the head split and
    # BEFORE RoPE — the HF Qwen3Attention order.  Stabilizes attention
    # logits without the QK-clip tricks older families need.
    qk_norm: bool = False
    # Gemma-family switches: embed_scale multiplies token embeddings by
    # sqrt(d_model) (cast to the activation dtype, the HF normalizer);
    # norm="rms_offset" computes RMSNorm with gain (1 + w) (HF stores w
    # zero-centered); mlp_type="geglu" is gelu(gate)*up over the same
    # w_gate/w_up/w_down params as swiglu
    embed_scale: bool = False
    # multi-head latent attention (DeepSeek-V2/V3; models/mla.py):
    # K/V low-rank factored through a shared per-position latent of
    # kv_lora_rank floats (+ a decoupled shared rope key of
    # qk_rope_head_dim) — the decode cache shrinks ~2*h*head_dim /
    # (kv_rank + rope) and decode runs in the absorbed form.  The default
    # head geometry (nope 64 + rope 64 = v 128) keeps q/k/v head dims
    # equal so training attention stays on the fused flash kernel.
    attention: str = "mha"  # "mha" | "mla"
    q_lora_rank: int = 0  # 0 = direct q projection (no query compression)
    kv_lora_rank: int = 256
    qk_nope_head_dim: int = 64
    qk_rope_head_dim: int = 64
    v_head_dim: int | None = None  # None -> qk_nope + qk_rope

    @property
    def kv_heads(self) -> int:
        hkv = self.n_kv_heads or self.n_heads
        assert self.n_heads % hkv == 0, (self.n_heads, hkv)
        return hkv

    @property
    def qkv_out(self) -> int:
        # fused projection width: h + 2*hkv head outputs (== 3*d_model
        # for MHA, so existing checkpoints keep their shapes)
        return (self.n_heads + 2 * self.kv_heads) * self.head_dim

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)

    def rope_params(self) -> tuple[float, float]:
        """Effective (theta, position_scale) under rope_scaling."""
        if self.rope_scaling == 1.0:
            return self.rope_theta, 1.0
        if self.rope_scaling_type == "linear":
            return self.rope_theta, 1.0 / self.rope_scaling
        if self.rope_scaling_type == "ntk":
            d = self.head_dim
            return self.rope_theta * self.rope_scaling ** (d / (d - 2)), 1.0
        raise ValueError(f"unknown rope_scaling_type {self.rope_scaling_type!r}")


def _init_linear(key, fan_in, fan_out):
    scale = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -scale, scale)


def init_params(key, cfg: TransformerConfig):
    keys = jax.random.split(key, cfg.n_layers * 6 + 2)
    # rms_offset (Gemma) stores the gain zero-centered: init 0 => gain 1
    gain0 = 0.0 if cfg.norm == "rms_offset" else 1.0
    params = {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, cfg.d_model), jnp.float32)
        * 0.02,
        "final_norm": jnp.full((cfg.d_model,), gain0, jnp.float32),
        "blocks": [],
    }
    if cfg.pos == "learned":
        params["pos_embed"] = (
            jax.random.normal(keys[1], (cfg.max_seq_len, cfg.d_model),
                              jnp.float32) * 0.01)
    if cfg.norm == "layernorm":
        params["final_norm_b"] = jnp.zeros((cfg.d_model,), jnp.float32)
    for i in range(cfg.n_layers):
        k = keys[2 + i * 6 : 2 + (i + 1) * 6]
        if cfg.attention == "mla":
            from .mla import init_mla_block

            blk = {
                "attn_norm": jnp.full((cfg.d_model,), gain0, jnp.float32),
                "mlp_norm": jnp.full((cfg.d_model,), gain0, jnp.float32),
                **init_mla_block(k[0], cfg),
            }
        else:
            blk = {
                "attn_norm": jnp.full((cfg.d_model,), gain0, jnp.float32),
                "wqkv": _init_linear(k[0], cfg.d_model, cfg.qkv_out),
                "wo": _init_linear(k[1], cfg.d_model, cfg.d_model),
                "mlp_norm": jnp.full((cfg.d_model,), gain0, jnp.float32),
            }
        if cfg.qk_norm:
            blk["q_norm"] = jnp.ones((cfg.head_dim,), jnp.float32)
            blk["k_norm"] = jnp.ones((cfg.head_dim,), jnp.float32)
        if cfg.norm == "layernorm":
            blk["attn_norm_b"] = jnp.zeros((cfg.d_model,), jnp.float32)
            blk["mlp_norm_b"] = jnp.zeros((cfg.d_model,), jnp.float32)
        if cfg.proj_bias:
            blk["bqkv"] = jnp.zeros((cfg.qkv_out,), jnp.float32)
            blk["bo"] = jnp.zeros((cfg.d_model,), jnp.float32)
        if cfg.mlp_type == "gelu":
            blk["w_fc"] = _init_linear(k[2], cfg.d_model, cfg.d_ff)
            blk["w_proj"] = _init_linear(k[3], cfg.d_ff, cfg.d_model)
            if cfg.proj_bias:
                blk["b_fc"] = jnp.zeros((cfg.d_ff,), jnp.float32)
                blk["b_proj"] = jnp.zeros((cfg.d_model,), jnp.float32)
            params["blocks"].append(blk)
            continue
        if cfg.n_experts and i >= cfg.moe_first_dense:
            d_ex = cfg.moe_d_ff or cfg.d_ff  # fine-grained expert width
            blk["router"] = _init_linear(k[5], cfg.d_model, cfg.n_experts)
            if cfg.moe_score_bias:
                blk["router_bias"] = jnp.zeros((cfg.n_experts,), jnp.float32)
            blk["experts"] = [
                {
                    "w_gate": _init_linear(
                        jax.random.fold_in(k[2], e), cfg.d_model, d_ex),
                    "w_up": _init_linear(
                        jax.random.fold_in(k[3], e), cfg.d_model, d_ex),
                    "w_down": _init_linear(
                        jax.random.fold_in(k[4], e), d_ex, cfg.d_model),
                }
                for e in range(cfg.n_experts)
            ]
            if cfg.n_shared_experts:  # one fused always-on SwiGLU
                ds = d_ex * cfg.n_shared_experts
                e1 = cfg.n_experts  # fold index one past the routed set
                blk["shared"] = {
                    "w_gate": _init_linear(
                        jax.random.fold_in(k[2], e1), cfg.d_model, ds),
                    "w_up": _init_linear(
                        jax.random.fold_in(k[3], e1), cfg.d_model, ds),
                    "w_down": _init_linear(
                        jax.random.fold_in(k[4], e1), ds, cfg.d_model),
                }
        else:
            blk["w_gate"] = _init_linear(k[2], cfg.d_model, cfg.d_ff)
            blk["w_up"] = _init_linear(k[3], cfg.d_model, cfg.d_ff)
            blk["w_down"] = _init_linear(k[4], cfg.d_ff, cfg.d_model)
        params["blocks"].append(blk)
    return params


def lm_head_weight(params, dtype):
    """(d_model, vocab) LM head: the untied "lm_head" entry when present
    (HF checkpoints with tie_word_embeddings=False, models/hf.py), else
    the tied embedding transpose."""
    head = params["lm_head"] if "lm_head" in params else params["embed"].T
    return head.astype(dtype)


def rms_norm(x, gamma, eps=1e-6):
    # fp32 statistics regardless of activation dtype (Welford-kernel contract)
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(x.dtype) * gamma.astype(x.dtype)


def layer_norm(x, gamma, beta, eps=1e-5):
    """Mean-centered LayerNorm with bias (GPT-2/BERT convention), fp32 stats."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * gamma + beta).astype(x.dtype)


def apply_norm(x, p, name, cfg: TransformerConfig):
    """cfg-dispatched block norm: p[name] is the gain; LayerNorm reads the
    bias from p[name + "_b"]."""
    if cfg.norm == "rms":
        return rms_norm(x, p[name], cfg.norm_eps)
    if cfg.norm == "rms_offset":  # Gemma: gain is (1 + w), w stored as-is
        return rms_norm(x, p[name] + 1.0, cfg.norm_eps)
    return layer_norm(x, p[name], p[name + "_b"], cfg.norm_eps)


def _rope(x, theta: float, pos_scale: float = 1.0, pct: float = 1.0):
    """Rotary embeddings over the head dim; x: (B, H, S, D).  pos_scale < 1
    is linear position interpolation (see TransformerConfig.rope_scaling);
    pct < 1 rotates only the first pct of head dims (GPT-NeoX rotary_pct),
    the tail passes through."""
    if pct < 1.0:
        rot = int(x.shape[-1] * pct) & ~1  # even
        return jnp.concatenate(
            [_rope(x[..., :rot], theta, pos_scale), x[..., rot:]], axis=-1)
    b, h, s, d = x.shape
    half = d // 2
    freqs = jnp.exp(
        -math.log(theta) * jnp.arange(0, half, dtype=jnp.float32) / half
    )
    pos = jnp.arange(s, dtype=jnp.float32) * jnp.float32(pos_scale)
    ang = pos[:, None] * freqs[None, :]  # (S, half)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    r1 = xf1 * cos - xf2 * sin
    r2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)


def split_qkv(qkv, cfg: TransformerConfig):
    """(B, S, qkv_out) fused projection -> q (B,H,S,hd), k/v (B,Hkv,S,hd)."""
    b, s, _ = qkv.shape
    h, hkv, hd = cfg.n_heads, cfg.kv_heads, cfg.head_dim
    q = qkv[..., : h * hd].reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = qkv[..., h * hd : (h + hkv) * hd].reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    v = qkv[..., (h + hkv) * hd :].reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    return q, k, v


def apply_qk_norm(q, k, p, cfg: TransformerConfig):
    """Per-head q/k RMSNorm (cfg.qk_norm, Qwen3/OLMo2): normalizes over the
    head dim with the per-block (head_dim,) gains "q_norm"/"k_norm", after
    the head split, before RoPE.  No-op when the switch is off.  (MLA
    blocks reuse the "q_norm" key for the query-latent norm; they never
    reach this helper — cfg.attention="mla" bypasses the MHA mixers.)"""
    if not cfg.qk_norm:
        return q, k
    return (rms_norm(q, p["q_norm"], cfg.norm_eps),
            rms_norm(k, p["k_norm"], cfg.norm_eps))


def _plain_mm(y, w):
    if isinstance(w, tuple):  # QLoRA frozen base: (intN, scale) pair —
        # dequantize transiently (weight-only quant, W8/W4A16-style):
        # the dot stays differentiable w.r.t. y, the HBM-resident weight
        # stays int8/int4 (models/lora.quantize_base)
        from ..ops.quant import dequant_weight

        w = dequant_weight(w[0], w[1], y.dtype)
    return jnp.dot(y, w.astype(y.dtype), preferred_element_type=jnp.float32)


def _lora_delta(y, p, name):
    """Low-rank update for the block matmul `name`: scale * (y @ A) @ B in
    fp32, or None when the block carries no adapter for it (models/lora.py
    attaches the per-block "lora" subdict; base forward pays nothing)."""
    ad = p.get("lora", {}).get(name) if isinstance(p, dict) else None
    if ad is None:
        return None
    t = jnp.dot(y.astype(jnp.float32), ad["A"],
                preferred_element_type=jnp.float32)
    t = jnp.dot(t, ad["B"], preferred_element_type=jnp.float32)
    return t * jnp.float32(ad.get("scale", 1.0))


def _mm_with_lora(y, w, p, name):
    out = _plain_mm(y, w)
    d = _lora_delta(y, p, name)
    return out if d is None else out + d


def mlp(y, p, cfg: TransformerConfig, mm=_plain_mm):
    """SwiGLU MLP, dense or Mixtral-style routed mixture; returns fp32.

    `mm` abstracts the matmul so callers can substitute quantized weights
    (serve._mm dispatches (intN, scale) pairs) — one MLP definition serves
    training, dense generation, and paged decode.

    MoE (cfg.n_experts > 0): router logits in fp32, softmax over ALL
    experts, top-k weights renormalized to sum 1 (the HF Mixtral
    convention), every selected expert a full SwiGLU.  Experts run DENSE
    (each computes all tokens, output scaled by the routing weight — zero
    for unrouted): exact, static-shaped, and the right TPU trade at decode
    batch sizes where all expert weights are read anyway; large-scale
    sparse training should use the capacity-dispatch kernels in
    models/moe.py (EP all-to-all) instead.

    mlp_type="gelu" (GPT-2 family): w_fc -> tanh-GELU (HF "gelu_new") ->
    w_proj with optional biases; same mm abstraction, so quantized serving
    works unchanged (biases stay fp and add post-matmul in fp32)."""
    if cfg.mlp_type == "gelu":
        h = mm(y, p["w_fc"])
        if "b_fc" in p:
            h = h + p["b_fc"]
        act = jax.nn.gelu(h, approximate=not cfg.gelu_exact).astype(y.dtype)
        out = mm(act, p["w_proj"])
        if "b_proj" in p:
            out = out + p["b_proj"]
        return out
    if not (cfg.n_experts and "experts" in p):  # dense (incl. the
        # first moe_first_dense layers of a DeepSeek-style stack)
        def mml(x_, name):  # base matmul + optional LoRA delta
            out = mm(x_, p[name])
            d = _lora_delta(x_, p, name)
            return out if d is None else out + d

        gate = mml(y, "w_gate")
        up = mml(y, "w_up")
        g = (jax.nn.gelu(gate, approximate=True) if cfg.mlp_type == "geglu"
             else jax.nn.silu(gate))  # geglu: Gemma's gelu_pytorch_tanh
        act = (g * up).astype(y.dtype)
        return mml(act, "w_down")
    logits = jnp.dot(
        y.astype(jnp.float32), p["router"].astype(jnp.float32)
    )  # (..., E) fp32 routing
    if cfg.moe_score == "sigmoid":  # DeepSeek-V3 scoring
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    # selection scores: optional per-expert correction bias (V3's
    # e_score_correction_bias — biases WHICH experts are picked, not the
    # mixing weights), then optional group-limited masking
    choice = scores + p["router_bias"] if "router_bias" in p else scores
    if cfg.moe_n_group > 1:
        e_per_g = cfg.n_experts // cfg.moe_n_group
        gs = choice.reshape(*choice.shape[:-1], cfg.moe_n_group, e_per_g)
        # group score = sum of its top-2 expert choice-scores (HF V3)
        group_scores = jnp.sum(jax.lax.top_k(gs, 2)[0], axis=-1)
        _, gsel = jax.lax.top_k(group_scores, cfg.moe_topk_group)
        gmask = jnp.sum(
            jax.nn.one_hot(gsel, cfg.moe_n_group, dtype=jnp.float32),
            axis=-2)  # (..., n_group) in {0,1}
        choice = jnp.where(
            jnp.repeat(gmask, e_per_g, axis=-1) > 0, choice, 0.0)
    _, topi = jax.lax.top_k(choice, cfg.moe_top_k)
    # mixing weights come from the RAW scores at the selected experts
    topv = jnp.take_along_axis(scores, topi, axis=-1)
    if cfg.moe_norm_topk:
        denom = jnp.sum(topv, axis=-1, keepdims=True)
        if cfg.moe_score == "sigmoid":
            denom = denom + 1e-20  # HF V3 epsilon
        topv = topv / denom
    if cfg.moe_routed_scale != 1.0:
        topv = topv * jnp.float32(cfg.moe_routed_scale)
    onehot = jax.nn.one_hot(topi, cfg.n_experts, dtype=jnp.float32)
    w = jnp.einsum("...k,...ke->...e", topv, onehot)
    out = None
    for e, pe in enumerate(p["experts"]):
        g = mm(y, pe["w_gate"])
        u = mm(y, pe["w_up"])
        act = (jax.nn.silu(g) * u).astype(y.dtype)
        oe = mm(act, pe["w_down"]).astype(jnp.float32) * w[..., e : e + 1]
        out = oe if out is None else out + oe
    if "shared" in p:  # DeepSeek always-on shared experts (one SwiGLU)
        ps = p["shared"]
        g = mm(y, ps["w_gate"])
        u = mm(y, ps["w_up"])
        act = (jax.nn.silu(g) * u).astype(y.dtype)
        out = out + mm(act, ps["w_down"]).astype(jnp.float32)
    return out


def attention_mixer(y, p, cfg: TransformerConfig):
    """Causal self-attention over the normed block input y (B, S, d):
    fused QKV projection -> RoPE -> flash kernel -> output projection.
    Returns the post-wo output (B, S, d) fp32.  Factored out of _block so
    heterogeneous stacks (models/hybrid.py) can reuse the exact mixer."""
    b, s, dm = y.shape
    if cfg.attention == "mla":
        from .mla import mla_attention

        return mla_attention(y, p, cfg)  # includes the wo projection
    qkv = _mm_with_lora(y, p["wqkv"], p, "wqkv")
    if "bqkv" in p:  # optional QKV bias (Qwen2/GPT-2-family)
        qkv = qkv + p["bqkv"]
    q, k, v = split_qkv(qkv.astype(y.dtype), cfg)
    q, k = apply_qk_norm(q, k, p, cfg)
    if cfg.pos == "rope":
        theta, pscale = cfg.rope_params()
        q = _rope(q, theta, pscale, cfg.rope_pct)
        k = _rope(k, theta, pscale, cfg.rope_pct)
    if cfg.kv_heads == cfg.n_heads and cfg.attention_window is None:
        attn = causal_attention_fn(q, k, v)  # Pallas flash kernel on TPU
    else:
        from ..ops.attention import make_flash_attention

        attn = make_flash_attention(window=cfg.attention_window)(q, k, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, dm)
    o = _mm_with_lora(attn, p["wo"], p, "wo")
    if "bo" in p:  # optional output-projection bias (GPT-2/NeoX family)
        o = o + p["bo"]
    return o


def _block(x, p, cfg: TransformerConfig):
    # attention
    y = apply_norm(x, p, "attn_norm", cfg)
    o = attention_mixer(y, p, cfg)

    # MLP (SwiGLU, GELU, or MoE — see mlp()).  parallel_residual
    # (GPT-NeoX/GPT-J): both branches read the SAME block input
    if cfg.parallel_residual:
        y = apply_norm(x, p, "mlp_norm", cfg)
        return x + o.astype(x.dtype) + mlp(y, p, cfg).astype(x.dtype)
    x = x + o.astype(x.dtype)
    y = apply_norm(x, p, "mlp_norm", cfg)
    x = x + mlp(y, p, cfg).astype(x.dtype)
    return x


def embed_tokens(params, tokens, cfg: TransformerConfig):
    """Token embedding in the activation dtype; cfg.embed_scale applies
    Gemma's sqrt(d_model) normalizer (cast to the activation dtype, the
    HF convention)."""
    x = params["embed"][tokens].astype(cfg.act_dtype)
    # getattr: pipeline configs (PipelineMoEConfig) duck-type the fields
    # embed_tokens reads but predate the Gemma switch
    if getattr(cfg, "embed_scale", False):
        x = x * jnp.asarray(math.sqrt(cfg.d_model), cfg.act_dtype)
    return x


def hidden_states(params, tokens, cfg: TransformerConfig):
    """tokens: (B, S) int32 -> final-norm trunk output (B, S, d_model)."""
    x = embed_tokens(params, tokens, cfg)
    if cfg.pos == "learned":
        x = x + params["pos_embed"][: tokens.shape[1]].astype(cfg.act_dtype)
    block_fn = _block
    if cfg.remat:
        block_fn = jax.checkpoint(_block, static_argnums=(2,))
    for p in params["blocks"]:
        x = block_fn(x, p, cfg)
    return apply_norm(x, params, "final_norm", cfg)


def forward(params, tokens, cfg: TransformerConfig):
    """tokens: (B, S) int32 -> logits (B, S, vocab) fp32."""
    x = hidden_states(params, tokens, cfg)
    # tied LM head (or an untied "lm_head" from an HF checkpoint)
    return jnp.dot(
        x, lm_head_weight(params, x.dtype), preferred_element_type=jnp.float32
    )


def _masked_mean(nll, targets, ignore_index):
    """Token-mean NLL; positions with target == ignore_index contribute
    nothing (padding / prompt-only tokens in SFT)."""
    if ignore_index is None:
        return jnp.mean(nll)
    mask = (targets != ignore_index).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), jnp.float32(1.0))
    return jnp.sum(nll * mask) / denom


def loss_fn(params, tokens, targets, cfg: TransformerConfig,
            ignore_index: int | None = None):
    logits = forward(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = targets if ignore_index is None else jnp.maximum(targets, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, targets, ignore_index)


def loss_fn_chunked(params, tokens, targets, cfg: TransformerConfig,
                    vocab_chunk: int = 4096, ignore_index: int | None = None):
    """loss_fn without ever materializing the (B, S, vocab) logits: the LM
    head is streamed in vocab chunks with an online logsumexp (models/loss.py).
    Numerically equivalent (same fp32-accumulated matmul, same log-softmax);
    peak memory drops from O(B*S*V) to O(B*S*vocab_chunk)."""
    from .loss import chunked_softmax_xent

    x = hidden_states(params, tokens, cfg)
    b, s, d = x.shape
    head = params["lm_head"] if "lm_head" in params else params["embed"].T
    # ignored targets (< 0) never hit any chunk, so their gathered logit is
    # 0 and their nll is just the (finite) lse — masked out below
    nll = chunked_softmax_xent(
        x.reshape(b * s, d), head, targets.reshape(-1), vocab_chunk
    )
    return _masked_mean(nll, targets.reshape(-1), ignore_index)
