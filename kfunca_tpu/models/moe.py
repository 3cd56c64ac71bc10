"""Mixture-of-Experts FFN: top-1 (switch) routing with capacity.

Green-field capability (the reference has no models at all): the expert-
parallel member of the model family.  TPU-first design constraints drive
everything here:

  * static shapes — routing uses a fixed capacity per expert; overflow
    tokens are dropped (standard Switch-Transformer semantics), so the
    dispatch/combine tensors have shapes independent of the routing result.
  * dispatch and combine are einsums (one-hot matmuls) — MXU work, not
    gathers, and GSPMD can shard them over the expert axis ("ep"): expert
    weights are sharded E-over-ep, the dispatch einsum becomes an
    all-to-all on ICI.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MoEConfig:
    n_experts: int = 8
    capacity_factor: float = 1.25
    d_model: int = 512
    d_ff: int = 1024


def init_moe_params(key, cfg: MoEConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    scale_in = 1.0 / math.sqrt(cfg.d_model)
    scale_out = 1.0 / math.sqrt(cfg.d_ff)
    return {
        "router": jax.random.uniform(
            k1, (cfg.d_model, cfg.n_experts), jnp.float32, -scale_in, scale_in
        ),
        "w_in": jax.random.uniform(
            k2, (cfg.n_experts, cfg.d_model, cfg.d_ff), jnp.float32, -scale_in, scale_in
        ),
        "w_out": jax.random.uniform(
            k3, (cfg.n_experts, cfg.d_ff, cfg.d_model), jnp.float32, -scale_out, scale_out
        ),
    }


def moe_ffn(x, params, cfg: MoEConfig):
    """x: (B, S, D) -> (B, S, D), plus the load-balancing aux loss.

    Returns (out, aux_loss).
    """
    b, s, d = x.shape
    n_tokens = b * s
    e = cfg.n_experts
    cap = max(1, int(cfg.capacity_factor * n_tokens / e))

    xt = x.reshape(n_tokens, d)
    logits = jnp.dot(
        xt.astype(jnp.float32), params["router"], preferred_element_type=jnp.float32
    )  # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    expert_idx = jnp.argmax(probs, axis=-1)  # (T,)
    gate = jnp.max(probs, axis=-1)  # (T,)

    # position of each token within its expert's queue (static-shape cumsum)
    onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.float32)  # (T, E)
    position = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot  # (T, E)
    pos_in_expert = jnp.sum(position, axis=-1)  # (T,)
    keep = pos_in_expert < cap  # overflow tokens dropped

    # dispatch tensor: (T, E, cap) one-hot over (expert, slot)
    slot_onehot = jax.nn.one_hot(pos_in_expert.astype(jnp.int32), cap, dtype=jnp.float32)
    dispatch = onehot[:, :, None] * slot_onehot[:, None, :] * keep[:, None, None]

    # route tokens to expert buffers: (E, cap, D) — all-to-all under ep sharding
    expert_in = jnp.einsum("tec,td->ecd", dispatch, xt.astype(jnp.float32))
    # expert FFN (batched over E: MXU-batched matmuls, shardable over ep)
    h = jax.nn.gelu(
        jnp.einsum("ecd,edf->ecf", expert_in, params["w_in"], preferred_element_type=jnp.float32)
    )
    expert_out = jnp.einsum(
        "ecf,efd->ecd", h, params["w_out"], preferred_element_type=jnp.float32
    )
    # combine back, weighted by the gate
    combine = dispatch * gate[:, None, None]
    out = jnp.einsum("tec,ecd->td", combine, expert_out)

    # Switch load-balancing loss: E * sum_e (fraction_tokens_e * mean_prob_e)
    frac_tokens = jnp.mean(onehot, axis=0)
    mean_probs = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac_tokens * mean_probs)
    return out.astype(x.dtype).reshape(b, s, d), aux
