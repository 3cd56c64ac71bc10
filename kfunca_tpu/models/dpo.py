"""DPO preference finetuning (Rafailov et al., "Direct Preference
Optimization: Your Language Model is Secretly a Reward Model").

Green-field capability (the reference `/root/reference` has no training
loop); completes the finetuning stack: pretraining (models/train.py), SFT
(ignore_index loss masking), LoRA (models/lora.py), and now preference
optimization — all sharing the same transformer forward and optimizer zoo.

The loss over a (chosen, rejected) completion pair:

    r_c = beta * (logp_pi(chosen)   - logp_ref(chosen))      # implicit
    r_r = beta * (logp_pi(rejected) - logp_ref(rejected))    # rewards
    L   = -(1-ls) * logsigmoid(r_c - r_r) - ls * logsigmoid(r_r - r_c)

with ls = label_smoothing (0 = standard DPO; >0 = the conservative cDPO
variant robust to preference-label noise).  logp are SUMS of per-token
log-likelihoods over completion positions (prompt/padding positions are
masked with ignore_index, the SFT convention).

TPU realization: sequence log-probs run through the chunked-vocab
streamed LM head (models/loss.py) — the (B, S, V) logits tensor is never
materialized, so pairs of full-length sequences fit alongside the model.
One jitted step computes 4 trunk forwards (policy/ref x chosen/rejected);
the reference forwards sit under stop_gradient so autodiff allocates no
cotangents for them.

LoRA-DPO (`make_lora_dpo_step`) exploits the adapter structure: the
REFERENCE model is the frozen base itself (adapters start at B=0, so
policy == ref at step 0 and the loss starts exactly at log 2).  No second
copy of the weights exists anywhere — base params are closed over once and
shared by the policy (adapter-attached) and reference (plain) forwards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lora import attach_lora
from .loss import chunked_softmax_xent
from .train import OptConfig, apply_update
from .transformer import TransformerConfig, hidden_states, lm_head_weight


def sequence_logprobs(params, tokens, targets, cfg: TransformerConfig,
                      ignore_index: int = -100,
                      vocab_chunk: int | None = 4096):
    """(B,) fp32 sums of log p(target_t | context) over positions whose
    target != ignore_index.  vocab_chunk streams the LM head (default);
    None materializes full logits (small-vocab / debugging)."""
    x = hidden_states(params, tokens, cfg)  # (B, S, D)
    b, s, dm = x.shape
    flat_t = targets.reshape(-1).astype(jnp.int32)
    mask = (flat_t != ignore_index).astype(jnp.float32)
    safe = jnp.where(flat_t == ignore_index, 0, flat_t)
    if vocab_chunk is None:
        logits = jnp.dot(x.reshape(-1, dm), lm_head_weight(params, x.dtype),
                         preferred_element_type=jnp.float32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tokl = jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    else:
        w = lm_head_weight(params, jnp.float32)
        tokl = -chunked_softmax_xent(x.reshape(-1, dm), w, safe, vocab_chunk)
    return (tokl * mask).reshape(b, s).sum(axis=-1)


def dpo_loss(policy_params, ref_params, tok_c, tgt_c, tok_r, tgt_r,
             cfg: TransformerConfig, beta: float = 0.1,
             label_smoothing: float = 0.0, ignore_index: int = -100,
             vocab_chunk: int | None = 4096):
    """Mean DPO loss over the batch + metrics dict {"reward_margin",
    "reward_acc", "chosen_reward", "rejected_reward"} (implicit rewards,
    already beta-scaled; all stop-gradient scalars)."""
    lp = lambda p, tok, tgt: sequence_logprobs(
        p, tok, tgt, cfg, ignore_index, vocab_chunk)
    pi_c = lp(policy_params, tok_c, tgt_c)
    pi_r = lp(policy_params, tok_r, tgt_r)
    ref_c = jax.lax.stop_gradient(lp(ref_params, tok_c, tgt_c))
    ref_r = jax.lax.stop_gradient(lp(ref_params, tok_r, tgt_r))
    r_c = jnp.float32(beta) * (pi_c - ref_c)
    r_r = jnp.float32(beta) * (pi_r - ref_r)
    logits = r_c - r_r
    ls = jnp.float32(label_smoothing)
    loss = jnp.mean(-(1.0 - ls) * jax.nn.log_sigmoid(logits)
                    - ls * jax.nn.log_sigmoid(-logits))
    metrics = {
        "reward_margin": jax.lax.stop_gradient(jnp.mean(logits)),
        "reward_acc": jax.lax.stop_gradient(
            jnp.mean((logits > 0).astype(jnp.float32))),
        "chosen_reward": jax.lax.stop_gradient(jnp.mean(r_c)),
        "rejected_reward": jax.lax.stop_gradient(jnp.mean(r_r)),
    }
    return loss, metrics


def make_dpo_step(ref_params, cfg: TransformerConfig,
                  oc: OptConfig = OptConfig(weight_decay=0.0),
                  beta: float = 0.1, label_smoothing: float = 0.0,
                  ignore_index: int = -100,
                  vocab_chunk: int | None = 4096):
    """Full-parameter DPO: step(params, opt_state, tok_c, tgt_c, tok_r,
    tgt_r) -> (params, opt_state, metrics) with metrics["loss"] the
    scalar objective.  ref_params are closed over frozen (the usual
    recipe initializes policy = a copy of ref = the SFT checkpoint)."""
    def step(params, opt_state, tok_c, tgt_c, tok_r, tgt_r):
        def loss_fn(p):
            return dpo_loss(p, ref_params, tok_c, tgt_c, tok_r, tgt_r, cfg,
                            beta, label_smoothing, ignore_index, vocab_chunk)
        (loss_v, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, {"loss": loss_v, **metrics}

    return step


def make_lora_dpo_step(base_params, cfg: TransformerConfig,
                       oc: OptConfig = OptConfig(weight_decay=0.0),
                       beta: float = 0.1, label_smoothing: float = 0.0,
                       ignore_index: int = -100,
                       vocab_chunk: int | None = 4096):
    """LoRA-DPO: step(adapters, opt_state, tok_c, tgt_c, tok_r, tgt_r) ->
    (adapters, opt_state, metrics).  The frozen base IS the reference
    model (one copy of the big weights total); grads/moments are
    O(adapter).  At step 0 (B = 0) the loss is exactly log 2 and every
    reward is 0."""
    def step(adapters, opt_state, tok_c, tgt_c, tok_r, tgt_r):
        scale = adapters["scale"]

        def loss_fn(blocks):
            policy = attach_lora(base_params, {"blocks": blocks,
                                               "scale": scale})
            return dpo_loss(policy, base_params, tok_c, tgt_c, tok_r, tgt_r,
                            cfg, beta, label_smoothing, ignore_index,
                            vocab_chunk)
        (loss_v, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(adapters["blocks"])
        new_blocks, opt_state = apply_update(
            adapters["blocks"], grads, opt_state, oc)
        return ({"blocks": new_blocks, "scale": scale}, opt_state,
                {"loss": loss_v, **metrics})

    return step
