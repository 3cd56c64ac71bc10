"""Image captioning end-to-end: ViT prefix -> causal LM -> caption tokens.

Runs anywhere (tiny model; CPU-friendly).  Every stage is the production
module:

  * models/vision.py — the ViT patch encoder and the image-prefixed
    multimodal causal LM (the "multimodal transformers" scope the
    reference declares, reference README.md:2).

The dataset: each image lights up ONE quadrant (noise elsewhere) in one
of two intensities; the "caption" is [quadrant-token, intensity-token,
EOS].  A tiny model learns it to near-perfect exact-match; eval decodes
held-out images greedily through multimodal_forward.

    python examples/caption_multimodal.py
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from kfunca_tpu.models.train import OptConfig, apply_update, init_opt_state
from kfunca_tpu.models.transformer import TransformerConfig
from kfunca_tpu.models.vision import (
    MultimodalConfig, ViTConfig, init_multimodal_params, multimodal_forward,
    multimodal_loss)

BOS, EOS = 1, 2
QUAD0, INT0 = 3, 7  # quadrant tokens 3..6, intensity tokens 7..8


def make_batch(rng, b, size=16):
    quad = rng.randint(0, 4, b)
    inten = rng.randint(0, 2, b)
    img = rng.normal(scale=0.1, size=(b, size, size, 3)).astype(np.float32)
    h = size // 2
    for i in range(b):
        r, c = divmod(quad[i], 2)
        img[i, r * h:(r + 1) * h, c * h:(c + 1) * h] += 0.5 + inten[i]
    # teacher forcing: inputs [BOS, q, i], targets [q, i, EOS]
    inp = np.stack([np.full(b, BOS), QUAD0 + quad, INT0 + inten], 1)
    tgt = np.stack([QUAD0 + quad, INT0 + inten, np.full(b, EOS)], 1)
    return (jnp.asarray(img), jnp.asarray(inp, jnp.int32),
            jnp.asarray(tgt, jnp.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    cfg = MultimodalConfig(
        vit=ViTConfig(image_size=16, patch_size=4, d_model=64, n_heads=2,
                      n_layers=2, d_ff=128, dtype="float32"),
        text=TransformerConfig(vocab_size=16, d_model=64, n_heads=2,
                               n_layers=2, d_ff=128, max_seq_len=32,
                               dtype="float32"))
    params = init_multimodal_params(jax.random.PRNGKey(0), cfg)
    oc = OptConfig(lr=3e-3, weight_decay=0.0, warmup_steps=20,
                   total_steps=args.steps, min_lr_frac=0.05)
    opt = init_opt_state(params, oc)

    @jax.jit
    def step(params, opt, img, inp, tgt):
        loss, grads = jax.value_and_grad(multimodal_loss)(
            params, img, inp, tgt, cfg)
        params, opt = apply_update(params, grads, opt, oc)
        return params, opt, loss

    rng = np.random.RandomState(0)
    for i in range(args.steps):
        img, inp, tgt = make_batch(rng, args.batch)
        params, opt, loss = step(params, opt, img, inp, tgt)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    # held-out greedy captioning (iterated teacher-free forward)
    img, _, tgt = make_batch(np.random.RandomState(123), 64)
    toks = jnp.full((64, 1), BOS, jnp.int32)
    for _ in range(3):
        logits = multimodal_forward(params, img, toks, cfg)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        toks = jnp.concatenate([toks, nxt[:, None]], axis=1)
    got = np.asarray(toks[:, 1:])
    exact = (got == np.asarray(tgt)).all(axis=1).mean()
    print(f"held-out caption exact-match: {exact:.1%} "
          f"(sample: want={np.asarray(tgt)[0].tolist()} "
          f"got={got[0].tolist()})")
    if exact < 0.9:
        raise SystemExit("expected >=90% exact match")
    print("OK")


if __name__ == "__main__":
    main()
