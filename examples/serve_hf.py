"""Serve a HuggingFace checkpoint: import -> quantize -> stream.

With --model PATH, loads any local Llama/Mistral/Qwen2-family checkpoint
directory via transformers.  Without it, builds a tiny random Llama so the
example runs hermetically.  Demonstrates the production recipe:

  * from_hf weight import (exact-parity vs transformers),
  * w8a8 weight quantization + int8 KV cache (2x decode HBM traffic),
  * per-request sampling / penalties,
  * streaming token events + TTFT/TPOT stats,
  * optional tensor-parallel serving over every visible device (--tp).

    python examples/serve_hf.py --requests 6 --max-new 24
    python examples/serve_hf.py --model /path/to/llama --tp 4
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def tiny_hf_model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    return LlamaForCausalLM(LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, attn_implementation="eager",
    )).eval()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="local HF checkpoint dir")
    p.add_argument("--requests", type=int, default=6)
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--max-new", type=int, default=24)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--rep-penalty", type=float, default=1.1)
    p.add_argument("--tp", type=int, default=0, help="tensor-parallel ways")
    p.add_argument("--no-quant", action="store_true")
    args = p.parse_args()

    import numpy as np

    from kfunca_tpu.models.hf import from_hf
    from kfunca_tpu.models.serve import InferenceServer

    src = args.model if args.model else tiny_hf_model()
    params, cfg = from_hf(src)
    print(f"imported: {cfg.n_layers}L d{cfg.d_model} h{cfg.n_heads}/"
          f"kv{cfg.kv_heads} vocab {cfg.vocab_size}")

    mesh = None
    if args.tp:
        from kfunca_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.tp, dp=1, tp=args.tp)
        print(f"tensor-parallel over {args.tp} devices")

    srv = InferenceServer(
        params, cfg, batch_slots=args.slots, page_size=16, n_pages=256,
        max_pages_per_seq=16, mesh=mesh,
        quantize_weights=not args.no_quant, quantize_kv=not args.no_quant,
    )
    rng = np.random.default_rng(0)
    for i in range(args.requests):
        prompt = rng.integers(1, cfg.vocab_size, (int(rng.integers(4, 12)),))
        srv.submit(prompt.tolist(), max_new=args.max_new,
                   temperature=args.temperature,
                   repetition_penalty=args.rep_penalty)

    for rid, tok, lp, last in srv.stream():
        print(f"req {rid}: +{tok}" + ("  [done]" if last else ""), flush=True)

    stats = srv.throughput_stats()
    print(f"completed {stats['completed']} requests, "
          f"{stats['generated_tokens']} tokens; "
          f"ttft {stats['mean_ttft_s'] * 1e3:.0f} ms, "
          f"tpot {stats['mean_tpot_s'] * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
