"""End-to-end LM training example: data -> sharded train loop -> checkpoint
-> generation.

Runs anywhere (CPU mesh or TPU). On a 135M-param config this trains at
~94k tok/s on a single TPU v5e (86.6 ms/step, bf16 + remat + Pallas flash
attention).

    python examples/train_lm.py --steps 20
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
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=256)
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--ckpt", default="/tmp/kfunca_lm.npz")
    args = p.parse_args()

    from kfunca_tpu.models.data import Prefetcher, TokenDataset
    from kfunca_tpu.models.generate import generate
    from kfunca_tpu.models.train import init_opt_state, make_train_step
    from kfunca_tpu.models.transformer import TransformerConfig, init_params
    from kfunca_tpu.utils import checkpoint

    cfg = TransformerConfig(
        vocab_size=512,
        d_model=args.d_model,
        n_heads=max(2, args.d_model // 64),
        n_layers=args.layers,
        d_ff=args.d_model * 3,
        dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = init_opt_state(params)
    # chunked-vocab loss: streams the LM head in 256-wide chunks — at this
    # toy vocab it's a wash, at 32k+ it's ~4% faster and bounds peak memory
    # at O(B*S*chunk) (docs/TRAINING.md)
    step = jax.jit(make_train_step(cfg, loss_chunk=256))

    # synthetic corpus with learnable structure (arithmetic sequences)
    rng = np.random.default_rng(0)
    base = np.cumsum(rng.integers(1, 5, size=1 << 18)) % cfg.vocab_size
    ds = TokenDataset(base.astype(np.int32), args.seq, args.batch, seed=1)
    pf = Prefetcher(ds)

    try:
        t0 = time.perf_counter()
        for i in range(args.steps):
            tokens, targets = pf.next()
            params, opt, loss = step(params, opt, tokens, targets)
            if i % max(1, args.steps // 10) == 0 or i == args.steps - 1:
                print(f"step {i:4d}  loss {float(loss):.4f}")
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        print(f"{args.steps} steps in {dt:.1f}s = {args.steps*args.batch*args.seq/dt/1e3:.1f}k tok/s")
    finally:
        pf.close()

    checkpoint.save(args.ckpt, {"params": params, "opt": opt})
    print(f"checkpoint -> {args.ckpt}")

    restored = checkpoint.load(args.ckpt, like={"params": params, "opt": opt})
    prompt = jnp.asarray(base[:8][None, :].astype(np.int32))
    toks = generate(restored["params"], prompt, cfg, max_new=16)
    print("prompt :", base[:8].tolist())
    print("greedy :", np.asarray(toks)[0].tolist())
    print("truth  :", base[8:24].tolist())


if __name__ == "__main__":
    main()
