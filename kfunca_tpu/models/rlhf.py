"""GRPO policy-gradient finetuning (Shao et al., "DeepSeekMath: Pushing the
Limits of Mathematical Reasoning", the RL recipe behind DeepSeek-R1).

Completes the alignment stack: SFT (loss masking) -> DPO (models/dpo.py,
offline preference pairs) -> GRPO (online rollouts scored by an arbitrary
reward function).  No reference analog (the reference `/root/reference`
ships no training loop).

GRPO is PPO's clipped surrogate with the value network deleted: G
completions are sampled per prompt and the advantage of each is its
reward standardized WITHIN the group,

    A_i = (r_i - mean(r_group)) / (std(r_group) + eps)

so no learned baseline is needed.  The per-token objective is

    L = -E[ min(rho * A, clip(rho, 1-eps, 1+eps) * A) ] + beta * KL

with rho = exp(logp_pi - logp_old) and the KL penalty against a frozen
reference policy using the k3 estimator exp(d) - d - 1, d = ref - pi
(Schulman's low-variance form; non-negative for every sample).  Token
losses are averaged per sequence (completion tokens only) then over the
batch — the GRPO length normalization.

TPU realization: per-token log-probs run through the chunked-vocab
streamed LM head (models/loss.py) so the (B, S, V) logits tensor never
exists; rollouts reuse the one-compiled-program generate() scan; the
update step is one jitted program whose ratio/clip/KL math is pure
elementwise VPU work on (B, S) tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .loss import chunked_softmax_xent
from .train import OptConfig, apply_update
from .transformer import TransformerConfig, hidden_states, lm_head_weight


def token_logprobs(params, tokens, targets, cfg: TransformerConfig,
                   vocab_chunk: int | None = 4096):
    """(B, S) fp32 per-token log p(target_t | tokens_<=t).

    Positions with target < 0 get a finite garbage value (their gathered
    logit is 0) — callers mask them; no mask is applied here so the same
    function serves old/ref/policy log-prob computation."""
    x = hidden_states(params, tokens, cfg)
    b, s, dm = x.shape
    flat_t = targets.reshape(-1).astype(jnp.int32)
    safe = jnp.maximum(flat_t, 0)
    if vocab_chunk is None:
        logits = jnp.dot(x.reshape(-1, dm), lm_head_weight(params, x.dtype),
                         preferred_element_type=jnp.float32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tokl = jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    else:
        w = lm_head_weight(params, jnp.float32)
        tokl = -chunked_softmax_xent(x.reshape(-1, dm), w, safe, vocab_chunk)
    return tokl.reshape(b, s)


def grpo_advantages(rewards, group_size: int, eps: float = 1e-4):
    """Group-standardized advantages.

    rewards: (B,) fp32 with B = n_prompts * group_size, laid out
    group-major (all G completions of prompt 0, then prompt 1, ...) — the
    layout rollout_group produces.  Returns (B,) fp32 advantages that are
    zero-mean within every group; a group with identical rewards (e.g.
    all-failed) gets exactly zero advantage everywhere."""
    r = rewards.astype(jnp.float32).reshape(-1, group_size)
    mu = jnp.mean(r, axis=-1, keepdims=True)
    sd = jnp.std(r, axis=-1, keepdims=True)
    return ((r - mu) / (sd + jnp.float32(eps))).reshape(-1)


def _seq_mean(x, mask):
    """Per-sequence masked token mean -> batch mean (GRPO normalization)."""
    denom = jnp.maximum(jnp.sum(mask, axis=-1), jnp.float32(1.0))
    return jnp.mean(jnp.sum(x * mask, axis=-1) / denom)


def grpo_loss(params, tokens, targets, old_logp, ref_logp, advantages,
              cfg: TransformerConfig, clip_eps: float = 0.2,
              kl_beta: float = 0.04, ignore_index: int = -100,
              vocab_chunk: int | None = 4096):
    """GRPO objective + metrics.

    tokens/targets: (B, S) shifted pair; prompt and padding positions carry
    target == ignore_index and contribute nothing.
    old_logp: (B, S) log-probs under the SAMPLING policy (rho's anchor;
    pass the current params' log-probs for fully-online single-epoch GRPO
    and the ratio starts at exactly 1).
    ref_logp: (B, S) log-probs under the frozen reference (KL anchor);
    kl_beta = 0 skips the penalty.
    advantages: (B,) per-sequence scalars (grpo_advantages).

    Returns (loss, metrics{kl, clip_frac, ratio_mean}).
    """
    mask = (targets != ignore_index).astype(jnp.float32)
    logp = token_logprobs(params, tokens, targets, cfg, vocab_chunk)
    rho = jnp.exp(logp - old_logp)
    adv = advantages.astype(jnp.float32)[:, None]
    lo, hi = jnp.float32(1.0 - clip_eps), jnp.float32(1.0 + clip_eps)
    surr = jnp.minimum(rho * adv, jnp.clip(rho, lo, hi) * adv)
    loss = -_seq_mean(surr, mask)
    # k3 KL estimator: exp(d) - d - 1 >= 0, d = ref - pi per token
    d = ref_logp - logp
    kl = _seq_mean(jnp.exp(d) - d - 1.0, mask)
    if kl_beta:
        loss = loss + jnp.float32(kl_beta) * kl
    clipped = ((rho < lo) | (rho > hi)).astype(jnp.float32)
    metrics = {
        "kl": jax.lax.stop_gradient(kl),
        "clip_frac": jax.lax.stop_gradient(_seq_mean(clipped, mask)),
        "ratio_mean": jax.lax.stop_gradient(_seq_mean(rho, mask)),
    }
    return loss, metrics


def make_grpo_step(cfg: TransformerConfig,
                   oc: OptConfig = OptConfig(weight_decay=0.0),
                   clip_eps: float = 0.2, kl_beta: float = 0.04,
                   ignore_index: int = -100,
                   vocab_chunk: int | None = 4096):
    """step(params, opt_state, tokens, targets, old_logp, ref_logp,
    advantages) -> (params, opt_state, metrics).  old/ref log-probs ride
    as DATA so one compiled step serves every inner epoch of a rollout
    batch (PPO-style multi-epoch reuse: compute old_logp once, step k
    times)."""
    def step(params, opt_state, tokens, targets, old_logp, ref_logp,
             advantages):
        def loss_fn(p):
            return grpo_loss(p, tokens, targets, old_logp, ref_logp,
                             advantages, cfg, clip_eps, kl_beta,
                             ignore_index, vocab_chunk)
        (loss_v, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, {"loss": loss_v, **metrics}

    return step


def rollout_group(params, prompt, cfg: TransformerConfig, group_size: int,
                  max_new: int, temperature: float = 1.0, key=None,
                  ignore_index: int = -100,
                  vocab_chunk: int | None = 4096):
    """Sample G completions per prompt and package them for grpo_loss.

    prompt: (P, T_prompt) int32 (right-aligned, no padding support here —
    pad upstream and mask via ignore_index if prompts vary in length).
    Returns dict with:
      completions: (P*G, max_new) sampled tokens (group-major layout)
      tokens/targets: (P*G, T_prompt+max_new-1) shifted training pair;
        targets mask everything before the first completion token
      old_logp: (P*G, S) log-probs of the targets under `params` (the
        sampling policy) — stop-gradient data for the ratio anchor
    Reward scoring is the caller's job (rewards are task-specific);
    feed them through grpo_advantages(rewards, group_size).
    """
    from .generate import generate

    if key is None:
        key = jax.random.PRNGKey(0)
    p_rep = jnp.repeat(prompt, group_size, axis=0)  # group-major
    completions = generate(params, p_rep, cfg, max_new,
                           temperature=temperature, key=key)
    seq = jnp.concatenate([p_rep, completions], axis=1)
    tokens, targets = seq[:, :-1], seq[:, 1:]
    t_prompt = prompt.shape[1]
    # target index t predicts seq[t+1]; completion tokens start at
    # seq[t_prompt], so targets are live from index t_prompt - 1 on
    pos = jnp.arange(targets.shape[1])
    targets = jnp.where(pos[None, :] >= t_prompt - 1, targets,
                        jnp.int32(ignore_index))
    old_logp = jax.lax.stop_gradient(
        token_logprobs(params, tokens, targets, cfg, vocab_chunk))
    return {"completions": completions, "tokens": tokens,
            "targets": targets, "old_logp": old_logp}
