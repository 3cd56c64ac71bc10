"""Serving example: continuous-batching inference over a paged KV cache.

Submits a burst of prompts against a small randomly-initialized model (swap
in checkpointed params for real use), runs the scheduler until every
request completes, and prints throughput stats.

    python examples/serve_lm.py --requests 12 --slots 4 --max-new 32
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=12)
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--max-new", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top-p", type=float, default=0.9)
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    args = p.parse_args()

    from kfunca_tpu.models.serve import InferenceServer
    from kfunca_tpu.models.transformer import TransformerConfig, init_params

    cfg = TransformerConfig(
        vocab_size=512,
        d_model=args.d_model,
        n_heads=max(2, args.d_model // 64),
        n_layers=args.layers,
        d_ff=args.d_model * 2,
        dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)

    srv = InferenceServer(
        params, cfg,
        batch_slots=args.slots,
        page_size=16,
        n_pages=512,
        max_pages_per_seq=16,
        temperature=args.temperature,
        top_p=args.top_p,
    )
    rng = np.random.default_rng(0)
    # mixed batch: every 3rd request overrides the server sampling params
    # (greedy / top-k / min-p) — one compiled step serves them all
    overrides = [
        {},
        {"temperature": 0.0},
        {"temperature": 1.0, "top_k": 40, "min_p": 0.02},
    ]
    ids = [
        srv.submit(rng.integers(1, cfg.vocab_size, rng.integers(4, 24)).tolist(),
                   max_new=args.max_new, **overrides[i % len(overrides)])
        for i in range(args.requests)
    ]

    t0 = time.perf_counter()
    results = srv.run()
    dt = time.perf_counter() - t0
    stats = srv.throughput_stats()
    print(f"completed {stats['completed']}/{len(ids)} requests in {dt:.2f}s")
    print(f"generated {stats['generated_tokens']} tokens "
          f"({stats['generated_tokens']/dt:.1f} tok/s incl. prefill+compile)")
    print(f"pages available after drain: {stats['pages_available']}")
    rid = ids[0]
    print(f"request {rid} tokens: {results[rid][:16]}...")


if __name__ == "__main__":
    main()
