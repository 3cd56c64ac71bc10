"""Online RL finetuning with GRPO: rollout -> reward -> group advantage -> step.

Runs anywhere (tiny model; CPU-friendly).  The task is synthetic but the
loop is the production recipe end to end:

  * models/rlhf.rollout_group — G sampled completions per prompt through
    the one-compiled-program generate() scan, packaged with masks and the
    sampling policy's own log-probs (the ratio anchor),
  * a programmatic reward (here: fraction of even tokens — stands in for
    a verifier / unit-test / preference model),
  * models/rlhf.grpo_advantages — rewards standardized WITHIN each group
    (no value network),
  * models/rlhf.make_grpo_step — PPO-clip surrogate + k3 KL anchor
    against the frozen starting policy, multi-epoch reuse of one rollout.

The mean reward climbs within a few rounds as the policy learns to emit
even tokens.

    python examples/rl_grpo.py --rounds 8 --group 8
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from kfunca_tpu.models.rlhf import (
    grpo_advantages,
    make_grpo_step,
    rollout_group,
)
from kfunca_tpu.models.train import OptConfig, init_opt_state
from kfunca_tpu.models.transformer import TransformerConfig, init_params


def reward_fn(completions):
    """Fraction of even tokens — any black-box scorer slots in here."""
    return jnp.mean((completions % 2 == 0).astype(jnp.float32), axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=12)
    ap.add_argument("--inner-epochs", type=int, default=2)
    args = ap.parse_args()

    cfg = TransformerConfig(vocab_size=97, d_model=64, n_heads=4,
                            n_layers=2, d_ff=128, max_seq_len=64,
                            dtype="float32")
    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    ref_params = params  # KL anchor: the starting policy

    oc = OptConfig(lr=3e-4, warmup_steps=0, weight_decay=0.0)
    opt_state = init_opt_state(params, oc)
    step = jax.jit(make_grpo_step(cfg, oc, clip_eps=0.2, kl_beta=0.02,
                                  vocab_chunk=None))

    prompts = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    from kfunca_tpu.models.rlhf import token_logprobs

    for r in range(args.rounds):
        key, sub = jax.random.split(key)
        out = rollout_group(params, prompts, cfg, args.group, args.max_new,
                            temperature=1.0, key=sub, vocab_chunk=None)
        rewards = reward_fn(out["completions"])
        adv = grpo_advantages(rewards, args.group)
        ref_logp = jax.lax.stop_gradient(token_logprobs(
            ref_params, out["tokens"], out["targets"], cfg, None))
        for _ in range(args.inner_epochs):  # PPO-style rollout reuse
            params, opt_state, m = step(params, opt_state, out["tokens"],
                                        out["targets"], out["old_logp"],
                                        ref_logp, adv)
        print(f"round {r}: reward={float(jnp.mean(rewards)):.3f} "
              f"loss={float(m['loss']):+.4f} kl={float(m['kl']):.4f} "
              f"clip={float(m['clip_frac']):.3f}")

    final = reward_fn(rollout_group(params, prompts, cfg, args.group,
                                    args.max_new, temperature=1.0,
                                    key=jax.random.PRNGKey(99),
                                    vocab_chunk=None)["completions"])
    print(f"final mean reward: {float(jnp.mean(final)):.3f} "
          f"(chance level ~0.5)")


if __name__ == "__main__":
    main()
