"""HuggingFace checkpoint import: Llama-family weights -> the flagship LM.

Capability extension past the reference (it has no models or checkpoint
interop; its only export path is to_numpy, reference src/register.cpp:41-57):
users bring real pretrained weights instead of random inits.

Supported architectures: anything with the Llama block structure —
RMSNorm -> RoPE attention (optional GQA, optional QKV bias) -> RMSNorm ->
SwiGLU MLP (dense, or a Mixtral-style top-k routed mixture) — which covers
Llama 1/2/3, Mistral (incl. sliding window), Mixtral (num_local_experts
-> TransformerConfig.n_experts), Qwen2/2.5 (QKV biases), TinyLlama,
OpenLlama, Vicuna-class finetunes, etc.  The conversion is exact (fp32): our RoPE is
the same half-split ("rotate_half") convention HF Llama uses, so no head
permutation is needed; parity vs `transformers` is pinned to ~1e-4 logits
in tests/test_hf.py.

Also supported: the GPT-2 block structure (model_type="gpt2" — LayerNorm
with bias -> learned positions -> tanh-GELU MLP, all projections biased,
tied head), covering GPT-2/DistilGPT2/DialoGPT-class checkpoints via
TransformerConfig(norm="layernorm", pos="learned", mlp_type="gelu").
GPT-2's Conv1D already stores weights (in, out) — our orientation, no
transpose.  Parity pinned vs GPT2LMHeadModel in tests/test_gpt2.py
(logits ~1e-4, greedy generation token-exact, to_hf roundtrip).

And the GPT-NeoX block structure (model_type="gpt_neox" — parallel
residual, partial rotary via rotary_pct, exact erf-GELU, biased
projections, untied embed_out), covering Pythia/GPT-NeoX/Dolly-class
checkpoints via TransformerConfig(parallel_residual=True, rope_pct=,
gelu_exact=True).  NeoX packs query_key_value PER HEAD ([q_h0|k_h0|
v_h0|q_h1|...]); import de-interleaves to our per-projection packing.
Parity pinned vs GPTNeoXForCausalLM in tests/test_neox.py.

Layout notes: HF Linear weights are (out, in) applied as x @ W.T; ours are
(in, out) applied as x @ W — every matrix transposes on the way in.  The
q/k/v projections fuse into our single wqkv (d_model, qkv_out).  Untied
LM heads become a "lm_head" params entry (lm_head_weight handles both).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .transformer import TransformerConfig


def _np(t) -> np.ndarray:
    """torch tensor (any dtype incl. bf16) or array-like -> fp32 numpy."""
    if hasattr(t, "detach"):  # torch tensor without importing torch
        t = t.detach()
        if t.dtype is not None and "bfloat16" in str(t.dtype):
            t = t.float()
        t = t.cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def config_from_hf(hf_config, dtype: str = "bfloat16") -> TransformerConfig:
    """Map a transformers PretrainedConfig (or plain dict) onto
    TransformerConfig.  Raises NotImplementedError for shapes the block
    structure can't represent (custom head_dim, non-linear rope scaling)."""
    get = (hf_config.get if isinstance(hf_config, dict)
           else lambda k, d=None: getattr(hf_config, k, d))
    if get("model_type") == "gpt_neox":
        act = get("hidden_act", "gelu")
        if act not in ("gelu", "gelu_new", "gelu_pytorch_tanh", "gelu_fast"):
            raise NotImplementedError(f"GPT-NeoX activation {act!r}")
        return TransformerConfig(
            vocab_size=get("vocab_size"),
            d_model=get("hidden_size"),
            n_heads=get("num_attention_heads"),
            n_layers=get("num_hidden_layers"),
            d_ff=get("intermediate_size"),
            max_seq_len=get("max_position_embeddings", 2048),
            dtype=dtype,
            rope_theta=float(get("rotary_emb_base", 10000.0)),
            rope_pct=float(get("rotary_pct", 1.0)),
            norm_eps=float(get("layer_norm_eps", 1e-5)),
            norm="layernorm", pos="rope", mlp_type="gelu", proj_bias=True,
            parallel_residual=bool(get("use_parallel_residual", True)),
            gelu_exact=act == "gelu",
        )
    if get("model_type") == "gpt2":
        act = get("activation_function", "gelu_new")
        if act not in ("gelu_new", "gelu_pytorch_tanh"):
            raise NotImplementedError(
                f"GPT-2 activation {act!r} not supported (tanh-GELU only)")
        d = get("n_embd")
        return TransformerConfig(
            vocab_size=get("vocab_size"),
            d_model=d,
            n_heads=get("n_head"),
            n_layers=get("n_layer"),
            d_ff=get("n_inner") or 4 * d,
            max_seq_len=get("n_positions", 1024),
            dtype=dtype,
            norm_eps=float(get("layer_norm_epsilon", 1e-5)),
            norm="layernorm", pos="learned", mlp_type="gelu",
            proj_bias=True,
        )
    if get("model_type") == "deepseek_v3":
        # DeepSeek-V3: MLA attention (q/kv low-rank latents, decoupled
        # rope key) + fine-grained sigmoid-routed MoE with shared experts
        # and group-limited ("noaux") selection; the first
        # first_k_dense_replace layers keep a dense MLP.
        if get("rope_scaling"):
            raise NotImplementedError(
                "deepseek_v3 yarn rope_scaling not supported")
        if get("attention_bias"):
            raise NotImplementedError("deepseek_v3 attention_bias")
        return TransformerConfig(
            vocab_size=get("vocab_size"),
            d_model=get("hidden_size"),
            n_heads=get("num_attention_heads"),
            n_layers=get("num_hidden_layers"),
            d_ff=get("intermediate_size"),
            max_seq_len=get("max_position_embeddings", 4096),
            dtype=dtype,
            rope_theta=float(get("rope_theta", 10000.0)),
            norm_eps=float(get("rms_norm_eps", 1e-6)),
            attention="mla",
            q_lora_rank=get("q_lora_rank") or 0,
            kv_lora_rank=get("kv_lora_rank"),
            qk_nope_head_dim=get("qk_nope_head_dim"),
            qk_rope_head_dim=get("qk_rope_head_dim"),
            v_head_dim=get("v_head_dim"),
            rope_interleave=bool(get("rope_interleave", True)),
            n_experts=get("n_routed_experts") or 0,
            moe_top_k=get("num_experts_per_tok") or 8,
            n_shared_experts=get("n_shared_experts") or 0,
            moe_d_ff=get("moe_intermediate_size"),
            moe_score="sigmoid",
            moe_norm_topk=bool(get("norm_topk_prob", True)),
            moe_routed_scale=float(get("routed_scaling_factor", 1.0)),
            moe_n_group=get("n_group") or 1,
            moe_topk_group=get("topk_group") or 1,
            moe_score_bias=True,
            moe_first_dense=get("first_k_dense_replace") or 0,
        )
    d_model = get("hidden_size")
    n_heads = get("num_attention_heads")
    head_dim = get("head_dim") or d_model // n_heads
    if head_dim != d_model // n_heads:
        raise NotImplementedError(
            f"custom head_dim {head_dim} != hidden_size/num_heads "
            f"{d_model // n_heads} is not supported"
        )
    if get("model_type") == "gemma":
        # Gemma: sqrt(d) embedding normalizer, (1 + w) RMSNorm, GeGLU MLP
        # (gelu_pytorch_tanh), tied head; the param layout is Llama's so
        # params_from_hf/to_hf work unchanged
        return TransformerConfig(
            vocab_size=get("vocab_size"),
            d_model=d_model,
            n_heads=n_heads,
            n_layers=get("num_hidden_layers"),
            d_ff=get("intermediate_size"),
            max_seq_len=get("max_position_embeddings", 8192),
            dtype=dtype,
            rope_theta=float(get("rope_theta", 10000.0)),
            norm_eps=float(get("rms_norm_eps", 1e-6)),
            n_kv_heads=get("num_key_value_heads") or n_heads,
            norm="rms_offset", mlp_type="geglu", embed_scale=True,
        )
    rope_scaling, rope_type = 1.0, "linear"
    rs = get("rope_scaling")
    if rs:
        kind = rs.get("rope_type", rs.get("type"))
        if kind == "linear":
            rope_scaling = float(rs["factor"])
        else:
            raise NotImplementedError(
                f"rope_scaling type {kind!r} not supported (linear only)"
            )
    window = get("sliding_window")
    if window is not None and get("use_sliding_window") is False:
        window = None  # Qwen2-style gate: configured but disabled
    # Mixtral-family MoE (num_local_experts) or Qwen3-MoE (num_experts,
    # fine-grained moe_intermediate_size, optional top-k renorm).  The
    # generic "num_experts" key is accepted ONLY for qwen3_moe: Qwen2-MoE
    # and OLMoE also publish it but carry always-on shared experts
    # (mlp.shared_expert.* + shared_expert_gate) / per-head q-k norms that
    # this importer does not map — importing them silently would drop those
    # weights and produce wrong logits, so they must fail loudly here.
    n_experts = get("num_local_experts") or 0
    if not n_experts and get("num_experts"):
        mt = get("model_type")
        if mt == "qwen3_moe":
            n_experts = get("num_experts")
        else:
            raise NotImplementedError(
                f"MoE model_type {mt!r} with num_experts is not supported "
                "(shared-expert layouts like qwen2_moe/olmoe are not mapped); "
                "supported MoE families: mixtral (num_local_experts), qwen3_moe")
    if get("model_type") == "qwen3_moe":
        if get("mlp_only_layers") or get("decoder_sparse_step", 1) != 1:
            raise NotImplementedError(
                "qwen3_moe heterogeneous dense/sparse layer patterns")
    return TransformerConfig(
        # Qwen3/Qwen3-MoE: per-head q/k RMSNorm before RoPE (and no QKV
        # bias — the bias keys are simply absent from its state dict)
        qk_norm=get("model_type") in ("qwen3", "qwen3_moe"),
        n_experts=n_experts,
        moe_top_k=get("num_experts_per_tok") or 2,
        moe_d_ff=get("moe_intermediate_size"),
        moe_norm_topk=bool(get("norm_topk_prob", True)),
        vocab_size=get("vocab_size"),
        d_model=d_model,
        n_heads=n_heads,
        n_layers=get("num_hidden_layers"),
        d_ff=get("intermediate_size"),
        max_seq_len=get("max_position_embeddings", 2048),
        dtype=dtype,
        rope_theta=float(get("rope_theta", 10000.0)),
        norm_eps=float(get("rms_norm_eps", 1e-6)),
        rope_scaling=rope_scaling,
        rope_scaling_type=rope_type,
        n_kv_heads=get("num_key_value_heads") or n_heads,
        attention_window=window,
    )


def _deinterleave_qkv(w, cfg, axis):
    """GPT-NeoX packs query_key_value per HEAD ([q_h0|k_h0|v_h0|q_h1|...]);
    ours packs per PROJECTION ([q all heads|k|v]).  Reorder `axis`."""
    h, hd = cfg.n_heads, cfg.head_dim
    shape = list(w.shape)
    pre = shape[:axis]
    w = w.reshape(*pre, h, 3, hd)
    w = jnp.moveaxis(w, axis + 1, axis)  # (..., 3, h, hd, ...)
    return w.reshape(*pre, 3 * h * hd)


def _params_from_hf_neox(state_dict, cfg: TransformerConfig):
    """GPT-NeoX/Pythia layout: gpt_neox.{embed_in,layers.N.*,
    final_layer_norm} + untied embed_out.  nn.Linear weights transpose
    (out, in) -> (in, out); query_key_value additionally de-interleaves
    from per-head to per-projection packing."""
    sd = {k.removeprefix("gpt_neox."): v for k, v in state_dict.items()}
    A = lambda name: jnp.asarray(_np(sd[name]))
    W = lambda name: jnp.asarray(_np(sd[name]).T)
    params = {
        "embed": A("embed_in.weight"),
        "final_norm": A("final_layer_norm.weight"),
        "final_norm_b": A("final_layer_norm.bias"),
        "lm_head": W("embed_out.weight"),
        "blocks": [],
    }
    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        params["blocks"].append({
            "attn_norm": A(p + "input_layernorm.weight"),
            "attn_norm_b": A(p + "input_layernorm.bias"),
            "wqkv": _deinterleave_qkv(
                W(p + "attention.query_key_value.weight"), cfg, 1),
            "bqkv": _deinterleave_qkv(
                A(p + "attention.query_key_value.bias"), cfg, 0),
            "wo": W(p + "attention.dense.weight"),
            "bo": A(p + "attention.dense.bias"),
            "mlp_norm": A(p + "post_attention_layernorm.weight"),
            "mlp_norm_b": A(p + "post_attention_layernorm.bias"),
            "w_fc": W(p + "mlp.dense_h_to_4h.weight"),
            "b_fc": A(p + "mlp.dense_h_to_4h.bias"),
            "w_proj": W(p + "mlp.dense_4h_to_h.weight"),
            "b_proj": A(p + "mlp.dense_4h_to_h.bias"),
        })
    return params


def _params_from_hf_gpt2(state_dict, cfg: TransformerConfig):
    """GPT-2 layout: transformer.{wte,wpe,h.N.*,ln_f}.  HF's Conv1D stores
    weights (in, out) — already our orientation, so NO transpose (unlike
    nn.Linear); the LM head is always tied to wte."""
    sd = {k.removeprefix("transformer."): v for k, v in state_dict.items()}
    A = lambda name: jnp.asarray(_np(sd[name]))
    params = {
        "embed": A("wte.weight"),
        "pos_embed": A("wpe.weight"),
        "final_norm": A("ln_f.weight"),
        "final_norm_b": A("ln_f.bias"),
        "blocks": [],
    }
    for i in range(cfg.n_layers):
        p = f"h.{i}."
        params["blocks"].append({
            "attn_norm": A(p + "ln_1.weight"),
            "attn_norm_b": A(p + "ln_1.bias"),
            "wqkv": A(p + "attn.c_attn.weight"),
            "bqkv": A(p + "attn.c_attn.bias"),
            "wo": A(p + "attn.c_proj.weight"),
            "bo": A(p + "attn.c_proj.bias"),
            "mlp_norm": A(p + "ln_2.weight"),
            "mlp_norm_b": A(p + "ln_2.bias"),
            "w_fc": A(p + "mlp.c_fc.weight"),
            "b_fc": A(p + "mlp.c_fc.bias"),
            "w_proj": A(p + "mlp.c_proj.weight"),
            "b_proj": A(p + "mlp.c_proj.bias"),
        })
    return params


def params_from_hf(state_dict, cfg: TransformerConfig, tied: bool | None = None):
    """Convert an HF Llama-family (or GPT-2-family) state dict (torch
    tensors or arrays) to the flagship params pytree.  `tied`: whether the
    LM head is the embedding (None = infer from lm_head.weight presence)."""
    if cfg.pos == "learned":  # GPT-2 layout
        return _params_from_hf_gpt2(state_dict, cfg)
    if cfg.parallel_residual:  # GPT-NeoX/Pythia layout
        return _params_from_hf_neox(state_dict, cfg)
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    for k in sd:
        if k.endswith((".o_proj.bias", ".gate_proj.bias", ".up_proj.bias",
                       ".down_proj.bias")):
            raise NotImplementedError(f"bias not supported ({k})")

    def W(name):  # HF (out, in) -> ours (in, out)
        return jnp.asarray(_np(sd[name]).T)

    params = {
        "embed": jnp.asarray(_np(sd["embed_tokens.weight"])),
        "final_norm": jnp.asarray(_np(sd["norm.weight"])),
        "blocks": [],
    }
    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        blk = {
            "attn_norm": jnp.asarray(_np(sd[p + "input_layernorm.weight"])),
            "wo": W(p + "self_attn.o_proj.weight"),
            "mlp_norm": jnp.asarray(_np(sd[p + "post_attention_layernorm.weight"])),
        }
        if cfg.attention == "mla":  # DeepSeek-V2/V3 latent attention
            h = cfg.n_heads
            nope, rope = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
            v_dim = cfg.v_head_dim or (nope + rope)
            d_c = cfg.kv_lora_rank
            if cfg.q_lora_rank:
                blk["w_dq"] = W(p + "self_attn.q_a_proj.weight")
                blk["q_norm"] = jnp.asarray(
                    _np(sd[p + "self_attn.q_a_layernorm.weight"]))
                blk["w_uq"] = W(p + "self_attn.q_b_proj.weight")
            else:
                blk["w_q"] = W(p + "self_attn.q_proj.weight")
            blk["w_dkv"] = W(p + "self_attn.kv_a_proj_with_mqa.weight")
            blk["kv_norm"] = jnp.asarray(
                _np(sd[p + "self_attn.kv_a_layernorm.weight"]))
            # kv_b_proj packs [k_nope | v] per head along its output dim
            wkv = W(p + "self_attn.kv_b_proj.weight").reshape(
                d_c, h, nope + v_dim)
            blk["w_uk"] = wkv[..., :nope].reshape(d_c, h * nope)
            blk["w_uv"] = wkv[..., nope:].reshape(d_c, h * v_dim)
        else:
            blk["wqkv"] = jnp.concatenate(
                [W(p + "self_attn.q_proj.weight"),
                 W(p + "self_attn.k_proj.weight"),
                 W(p + "self_attn.v_proj.weight")], axis=1)
        if p + "mlp.gate.weight" in sd:
            # DeepSeek MoE layout: mlp.{gate, experts.N.*_proj,
            # shared_experts.*_proj}; dense first_k_dense_replace layers
            # fall through to the plain mlp.*_proj branch below
            blk["router"] = W(p + "mlp.gate.weight")
            if p + "mlp.gate.e_score_correction_bias" in sd:
                blk["router_bias"] = jnp.asarray(
                    _np(sd[p + "mlp.gate.e_score_correction_bias"]))
            blk["experts"] = [
                {
                    "w_gate": W(p + f"mlp.experts.{e}.gate_proj.weight"),
                    "w_up": W(p + f"mlp.experts.{e}.up_proj.weight"),
                    "w_down": W(p + f"mlp.experts.{e}.down_proj.weight"),
                }
                for e in range(cfg.n_experts)
            ]
            if p + "mlp.shared_experts.gate_proj.weight" in sd:
                blk["shared"] = {
                    "w_gate": W(p + "mlp.shared_experts.gate_proj.weight"),
                    "w_up": W(p + "mlp.shared_experts.up_proj.weight"),
                    "w_down": W(p + "mlp.shared_experts.down_proj.weight"),
                }
        elif cfg.n_experts and p + "block_sparse_moe.gate.weight" in sd:
            # Mixtral: block_sparse_moe.{gate, experts.N.w1/w3/w2}
            blk["router"] = W(p + "block_sparse_moe.gate.weight")
            blk["experts"] = [
                {
                    "w_gate": W(p + f"block_sparse_moe.experts.{e}.w1.weight"),
                    "w_up": W(p + f"block_sparse_moe.experts.{e}.w3.weight"),
                    "w_down": W(p + f"block_sparse_moe.experts.{e}.w2.weight"),
                }
                for e in range(cfg.n_experts)
            ]
        else:
            blk["w_gate"] = W(p + "mlp.gate_proj.weight")
            blk["w_up"] = W(p + "mlp.up_proj.weight")
            blk["w_down"] = W(p + "mlp.down_proj.weight")
        if cfg.qk_norm:  # Qwen3: per-head (head_dim,) q/k norm gains
            blk["q_norm"] = jnp.asarray(_np(sd[p + "self_attn.q_norm.weight"]))
            blk["k_norm"] = jnp.asarray(_np(sd[p + "self_attn.k_norm.weight"]))
        if p + "self_attn.q_proj.bias" in sd:  # Qwen2-family QKV bias
            blk["bqkv"] = jnp.concatenate(
                [jnp.asarray(_np(sd[p + f"self_attn.{n}_proj.bias"]))
                 for n in ("q", "k", "v")])
        params["blocks"].append(blk)
    if tied is None:
        tied = "lm_head.weight" not in state_dict
    if not tied:
        params["lm_head"] = jnp.asarray(_np(state_dict["lm_head.weight"]).T)
    return params


def to_hf(params, cfg: TransformerConfig) -> dict:
    """The inverse of params_from_hf: flagship params -> an HF Llama-family
    state dict of fp32 torch tensors, loadable into LlamaForCausalLM /
    MistralForCausalLM via load_state_dict (train here, serve anywhere).
    Tied params emit no lm_head.weight (set tie_word_embeddings=True)."""
    import torch

    def T(x):  # ours (in, out) -> HF (out, in)
        return torch.from_numpy(np.asarray(x, dtype=np.float32).T.copy())

    def A(x):
        # .copy(): jax arrays export read-only buffers; torch warns on them
        return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())

    if cfg.parallel_residual:  # GPT-NeoX/Pythia layout
        h, hd = cfg.n_heads, cfg.head_dim

        def IW(x):  # ours (in, 3D per-projection) -> HF (3D per-head, in)
            x = np.asarray(x, np.float32).reshape(-1, 3, h, hd)
            x = np.moveaxis(x, 1, 2).reshape(-1, 3 * h * hd)
            return torch.from_numpy(x.T.copy())

        def IB(x):
            x = np.asarray(x, np.float32).reshape(3, h, hd)
            return torch.from_numpy(np.moveaxis(x, 0, 1).reshape(-1).copy())

        sd = {
            "gpt_neox.embed_in.weight": A(params["embed"]),
            "gpt_neox.final_layer_norm.weight": A(params["final_norm"]),
            "gpt_neox.final_layer_norm.bias": A(params["final_norm_b"]),
            "embed_out.weight": T(params["lm_head"]),
        }
        for i, blk in enumerate(params["blocks"]):
            p = f"gpt_neox.layers.{i}."
            sd[p + "input_layernorm.weight"] = A(blk["attn_norm"])
            sd[p + "input_layernorm.bias"] = A(blk["attn_norm_b"])
            sd[p + "attention.query_key_value.weight"] = IW(blk["wqkv"])
            sd[p + "attention.query_key_value.bias"] = IB(blk["bqkv"])
            sd[p + "attention.dense.weight"] = T(blk["wo"])
            sd[p + "attention.dense.bias"] = A(blk["bo"])
            sd[p + "post_attention_layernorm.weight"] = A(blk["mlp_norm"])
            sd[p + "post_attention_layernorm.bias"] = A(blk["mlp_norm_b"])
            sd[p + "mlp.dense_h_to_4h.weight"] = T(blk["w_fc"])
            sd[p + "mlp.dense_h_to_4h.bias"] = A(blk["b_fc"])
            sd[p + "mlp.dense_4h_to_h.weight"] = T(blk["w_proj"])
            sd[p + "mlp.dense_4h_to_h.bias"] = A(blk["b_proj"])
        return sd

    if cfg.pos == "learned":  # GPT-2 layout: Conv1D weights, no transpose
        sd = {
            "transformer.wte.weight": A(params["embed"]),
            "transformer.wpe.weight": A(params["pos_embed"]),
            "transformer.ln_f.weight": A(params["final_norm"]),
            "transformer.ln_f.bias": A(params["final_norm_b"]),
            "lm_head.weight": A(params["embed"]),  # tied
        }
        for i, blk in enumerate(params["blocks"]):
            p = f"transformer.h.{i}."
            sd[p + "ln_1.weight"] = A(blk["attn_norm"])
            sd[p + "ln_1.bias"] = A(blk["attn_norm_b"])
            sd[p + "attn.c_attn.weight"] = A(blk["wqkv"])
            sd[p + "attn.c_attn.bias"] = A(blk["bqkv"])
            sd[p + "attn.c_proj.weight"] = A(blk["wo"])
            sd[p + "attn.c_proj.bias"] = A(blk["bo"])
            sd[p + "ln_2.weight"] = A(blk["mlp_norm"])
            sd[p + "ln_2.bias"] = A(blk["mlp_norm_b"])
            sd[p + "mlp.c_fc.weight"] = A(blk["w_fc"])
            sd[p + "mlp.c_fc.bias"] = A(blk["b_fc"])
            sd[p + "mlp.c_proj.weight"] = A(blk["w_proj"])
            sd[p + "mlp.c_proj.bias"] = A(blk["b_proj"])
        return sd

    h = cfg.n_heads
    if cfg.attention != "mla":  # head_dim asserts d_model % n_heads
        hkv, hd = cfg.kv_heads, cfg.head_dim
    sd = {
        "model.embed_tokens.weight": A(params["embed"]),
        "model.norm.weight": A(params["final_norm"]),
    }
    for i, blk in enumerate(params["blocks"]):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = A(blk["attn_norm"])
        if cfg.attention == "mla":  # DeepSeek-V2/V3 latent attention
            # inverse of the params_from_hf kv_b_proj unpack: re-interleave
            # [k_nope | v] per head along the output dim
            nope, rope = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
            v_dim = cfg.v_head_dim or (nope + rope)
            d_c = cfg.kv_lora_rank
            if "w_dq" in blk:  # q LoRA (V2/V3 large)
                sd[p + "self_attn.q_a_proj.weight"] = T(blk["w_dq"])
                sd[p + "self_attn.q_a_layernorm.weight"] = A(blk["q_norm"])
                sd[p + "self_attn.q_b_proj.weight"] = T(blk["w_uq"])
            else:
                sd[p + "self_attn.q_proj.weight"] = T(blk["w_q"])
            sd[p + "self_attn.kv_a_proj_with_mqa.weight"] = T(blk["w_dkv"])
            sd[p + "self_attn.kv_a_layernorm.weight"] = A(blk["kv_norm"])
            wkv = np.concatenate(
                [np.asarray(blk["w_uk"], np.float32).reshape(d_c, h, nope),
                 np.asarray(blk["w_uv"], np.float32).reshape(d_c, h, v_dim)],
                axis=-1).reshape(d_c, h * (nope + v_dim))
            sd[p + "self_attn.kv_b_proj.weight"] = T(wkv)
        else:
            q, k, v = (blk["wqkv"][:, : h * hd],
                       blk["wqkv"][:, h * hd : (h + hkv) * hd],
                       blk["wqkv"][:, (h + hkv) * hd :])
            sd[p + "self_attn.q_proj.weight"] = T(q)
            sd[p + "self_attn.k_proj.weight"] = T(k)
            sd[p + "self_attn.v_proj.weight"] = T(v)
            if "bqkv" in blk:
                bq, bk, bv = (blk["bqkv"][: h * hd],
                              blk["bqkv"][h * hd : (h + hkv) * hd],
                              blk["bqkv"][(h + hkv) * hd :])
                sd[p + "self_attn.q_proj.bias"] = A(bq)
                sd[p + "self_attn.k_proj.bias"] = A(bk)
                sd[p + "self_attn.v_proj.bias"] = A(bv)
        if "q_norm" in blk and cfg.qk_norm:  # Qwen3 per-head q/k norms
            sd[p + "self_attn.q_norm.weight"] = A(blk["q_norm"])
            sd[p + "self_attn.k_norm.weight"] = A(blk["k_norm"])
        sd[p + "self_attn.o_proj.weight"] = T(blk["wo"])
        sd[p + "post_attention_layernorm.weight"] = A(blk["mlp_norm"])
        if "experts" in blk and (cfg.attention == "mla" or cfg.qk_norm
                                 or "shared" in blk or "router_bias" in blk):
            # DeepSeek / Qwen3-MoE layout: mlp.{gate, experts.N.*_proj,
            # shared_experts.*} — the inverse of the mlp.gate import branch
            sd[p + "mlp.gate.weight"] = T(blk["router"])
            if "router_bias" in blk:
                sd[p + "mlp.gate.e_score_correction_bias"] = A(blk["router_bias"])
            for e, ex in enumerate(blk["experts"]):
                ep = p + f"mlp.experts.{e}."
                sd[ep + "gate_proj.weight"] = T(ex["w_gate"])
                sd[ep + "up_proj.weight"] = T(ex["w_up"])
                sd[ep + "down_proj.weight"] = T(ex["w_down"])
            if "shared" in blk:
                sp = p + "mlp.shared_experts."
                sd[sp + "gate_proj.weight"] = T(blk["shared"]["w_gate"])
                sd[sp + "up_proj.weight"] = T(blk["shared"]["w_up"])
                sd[sp + "down_proj.weight"] = T(blk["shared"]["w_down"])
        elif "experts" in blk:  # Mixtral layout
            sd[p + "block_sparse_moe.gate.weight"] = T(blk["router"])
            for e, ex in enumerate(blk["experts"]):
                ep = p + f"block_sparse_moe.experts.{e}."
                sd[ep + "w1.weight"] = T(ex["w_gate"])
                sd[ep + "w3.weight"] = T(ex["w_up"])
                sd[ep + "w2.weight"] = T(ex["w_down"])
        else:
            sd[p + "mlp.gate_proj.weight"] = T(blk["w_gate"])
            sd[p + "mlp.up_proj.weight"] = T(blk["w_up"])
            sd[p + "mlp.down_proj.weight"] = T(blk["w_down"])
    if "lm_head" in params:
        sd["lm_head.weight"] = T(params["lm_head"])
    return sd


def from_hf(model_or_path, dtype: str = "bfloat16"):
    """(params, cfg) from a transformers model instance or a local
    checkpoint directory.  `dtype` sets the ACTIVATION dtype; params are
    converted to fp32 (the framework's master-weight convention)."""
    if isinstance(model_or_path, (str, bytes)) or hasattr(model_or_path, "__fspath__"):
        from transformers import AutoModelForCausalLM

        model = AutoModelForCausalLM.from_pretrained(model_or_path)
    else:
        model = model_or_path
    cfg = config_from_hf(model.config, dtype=dtype)
    tied = bool(getattr(model.config, "tie_word_embeddings", False))
    params = params_from_hf(model.state_dict(), cfg, tied=tied)
    return params, cfg
