"""Speculative decoding example: a small draft model accelerates a larger
target model's greedy decoding with bit-identical output.

Both models are randomly initialized here (swap in checkpointed params for
real use); the draft shares the target's tokenizer/vocab.  Prints the
accepted-tokens-per-round diagnostic and verifies the output matches plain
greedy generation exactly.

    python examples/speculative_lm.py --max-new 48 --gamma 4
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-new", type=int, default=48)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--draft-d-model", type=int, default=64)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--draft-layers", type=int, default=2)
    args = p.parse_args()

    from kfunca_tpu.models.generate import generate
    from kfunca_tpu.models.speculative import speculative_generate
    from kfunca_tpu.models.transformer import TransformerConfig, init_params

    cfg_t = TransformerConfig(
        vocab_size=512, d_model=args.d_model, n_heads=8, n_layers=args.layers,
        d_ff=4 * args.d_model, max_seq_len=args.max_new + 64,
    )
    cfg_d = TransformerConfig(
        vocab_size=512, d_model=args.draft_d_model, n_heads=4,
        n_layers=args.draft_layers, d_ff=4 * args.draft_d_model,
        max_seq_len=args.max_new + 64,
    )
    params_t = init_params(jax.random.PRNGKey(0), cfg_t)
    params_d = init_params(jax.random.PRNGKey(1), cfg_d)

    prompt = jnp.asarray([[3, 141, 59, 26, 5]], jnp.int32)

    t0 = time.perf_counter()
    ref = np.asarray(generate(params_t, prompt, cfg_t, max_new=args.max_new))
    jax.block_until_ready(ref)
    t_plain = time.perf_counter() - t0

    t0 = time.perf_counter()
    got, rounds = speculative_generate(
        params_t, cfg_t, params_d, cfg_d, prompt,
        max_new=args.max_new, gamma=args.gamma,
    )
    got = np.asarray(got)
    t_spec = time.perf_counter() - t0

    assert np.array_equal(got, ref), "speculative output must match greedy exactly"
    print(f"tokens: {got[0].tolist()}")
    print(
        f"target forwards: {int(rounds)} (vs {args.max_new} plain) — "
        f"{args.max_new / int(rounds):.2f} tokens/round accepted"
    )
    print(f"wall (incl. compile): plain {t_plain:.2f}s  speculative {t_spec:.2f}s")
    print("output EXACTLY matches plain greedy decoding")


if __name__ == "__main__":
    main()
