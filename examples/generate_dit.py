"""Image generation end-to-end: train a DiT, sample it back from pure noise.

Runs anywhere (tiny model; CPU-friendly).  Every stage is the production
module:

  * models/dit.py — adaLN-Zero diffusion transformer, DDPM eps-prediction
    training, one-program DDIM sampler (deterministic or eta-stochastic).

The dataset is a structured pattern (top half +1, bottom half -1, plus
pixel noise).  After a few hundred steps, DDIM sampling from pure noise
reproduces it: the script checks the generated images' top-bottom
contrast (want ~ +2) and pixel statistics.

Why not a class-conditional toy?  With antipodal 2-class data at this
scale the class is readable from x_t wherever the loss has weight, so
the label pathway receives ~no gradient and deterministic trajectories
park on the (flat) mixture mean — a property of the toy, not the stack:
the conditioning path is gradient-verified and CFG/eta mechanics are
pinned in tests/test_dit.py.  Real class-conditional DiTs train orders
of magnitude longer, which is exactly what buys their guidance signal.

    python examples/generate_dit.py
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from kfunca_tpu.models.dit import (
    DiTConfig, ddim_sample, init_dit_params, make_dit_train_step)
from kfunca_tpu.models.train import OptConfig, init_opt_state


def make_batch(rng, b, size):
    """Top half +1, bottom half -1, pixel noise 0.1 (zero-mean data,
    the range diffusion's N(0,1) prior expects)."""
    img = rng.normal(scale=0.1, size=(b, size, size, 1)).astype(np.float32)
    half = size // 2
    img[:, :half] += 1.0
    img[:, half:] -= 1.0
    return jnp.asarray(img), jnp.zeros((b,), jnp.int32)


def contrast(imgs):
    """Mean(top half) - mean(bottom half), per image."""
    half = imgs.shape[1] // 2
    return np.asarray(imgs[:, :half].mean(axis=(1, 2, 3))
                      - imgs[:, half:].mean(axis=(1, 2, 3)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eta", type=float, default=0.0)
    args = ap.parse_args()

    cfg = DiTConfig(image_size=16, patch_size=4, channels=1, d_model=96,
                    n_heads=4, n_layers=3, d_ff=256, n_classes=2,
                    timesteps=200, dtype="float32")
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    oc = OptConfig(lr=2e-3, weight_decay=0.0, warmup_steps=20,
                   total_steps=args.steps, min_lr_frac=0.05)
    opt = init_opt_state(params, oc)
    step = jax.jit(make_dit_train_step(cfg, oc))

    rng = np.random.RandomState(0)
    for i in range(args.steps):
        img, lab = make_batch(rng, args.batch, cfg.image_size)
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i), img,
                                 lab)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  eps-MSE {float(loss):.4f}")

    imgs = ddim_sample(params, jax.random.PRNGKey(999),
                       jnp.zeros((16,), jnp.int32), cfg, steps=40,
                       eta=args.eta)
    c = contrast(imgs)
    print(f"sampled top-bottom contrast mean {c.mean():+.3f} "
          f"(want ~ +2.0), min {c.min():+.3f}; "
          f"pixel std {float(np.asarray(imgs).std()):.2f}")
    if not (c.mean() > 1.7 and c.min() > 1.3):
        raise SystemExit("samples do not reproduce the training pattern")
    print("OK")


if __name__ == "__main__":
    main()
