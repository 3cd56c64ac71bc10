"""Serve a DeepSeek-V3-family model: HF import -> latent-slot serving.

Builds a tiny random DeepseekV3 (MLA attention + sigmoid-routed
fine-grained MoE with shared experts) so the example runs hermetically,
imports it with exact parity, then serves a mixed batch of requests
through MLAServer — continuous batching over compressed-latent slots
(one (kv_lora_rank + qk_rope_head_dim) vector per position per layer
instead of per-head K/V pages) with absorbed-form decode.

Asserts: every request's greedy tokens match the dense generate() path
exactly, despite running interleaved over fewer slots than requests.

    python examples/serve_deepseek.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def tiny_deepseek():
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(0)
    return DeepseekV3ForCausalLM(DeepseekV3Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        moe_intermediate_size=64, num_hidden_layers=3,
        first_k_dense_replace=1, num_attention_heads=8,
        num_key_value_heads=8, n_routed_experts=8, num_experts_per_tok=2,
        n_shared_experts=1, n_group=4, topk_group=2,
        routed_scaling_factor=2.5, q_lora_rank=64, kv_lora_rank=32,
        qk_nope_head_dim=16, qk_rope_head_dim=16, v_head_dim=16,
        max_position_embeddings=256, rope_scaling=None,
        tie_word_embeddings=True, attn_implementation="eager",
    )).eval()


def main():
    import numpy as np

    import jax.numpy as jnp
    from kfunca_tpu.models.generate import generate
    from kfunca_tpu.models.hf import from_hf
    from kfunca_tpu.models.mla_serve import MLAServer

    print("== importing a tiny random DeepSeek-V3 ==")
    params, cfg = from_hf(tiny_deepseek(), dtype="float32")
    print(f"   attention={cfg.attention} experts={cfg.n_experts} "
          f"shared={cfg.n_shared_experts} latent/pos = "
          f"{cfg.kv_lora_rank + cfg.qk_rope_head_dim} floats "
          f"(vs {2 * cfg.n_heads * 16} for per-head K/V)")

    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 256, rng.integers(3, 10)))
               for _ in range(6)]

    print("== dense generate() oracle ==")
    want = [list(np.asarray(generate(
        params, jnp.asarray([p], jnp.int32), cfg, max_new=8))[0])
        for p in prompts]

    print("== MLAServer: 6 requests over 2 latent slots ==")
    srv = MLAServer(params, cfg, batch_slots=2, max_seq_len=64)
    rids = [srv.submit(p, max_new=8) for p in prompts]
    out = srv.run()
    for i, rid in enumerate(rids):
        got = [int(t) for t in out[rid]]
        ref = [int(t) for t in want[i]]
        status = "ok" if got == ref else f"MISMATCH {ref}"
        print(f"   req{i}: {got} {status}")
        assert got == ref, (i, got, ref)
    print("all requests token-exact vs the dense decode path")


if __name__ == "__main__":
    main()
