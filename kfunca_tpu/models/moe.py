"""Mixture-of-Experts FFN: top-1 (switch) and top-2 routing with capacity.

Green-field capability (the reference has no models at all): the expert-
parallel member of the model family.  TPU-first design constraints drive
everything here:

  * static shapes — routing uses a fixed capacity per expert; overflow
    tokens are dropped (standard Switch-Transformer semantics), so the
    dispatch/combine tensors have shapes independent of the routing result.
  * top-k routing fills expert queues in CHOICE-RANK order: every token's
    first choice is seated before any second choice competes for capacity
    (GShard semantics), all with static-shape cumsums.
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
    top_k: int = 1  # 1 = switch routing; 2 = GShard-style top-2
    # capacity-overflow second pass ("no-token-left-behind", Switch paper
    # appendix): tokens whose every top-k choice overflowed compete for the
    # remaining capacity of their NEXT-preference experts, one extra
    # choice rank per rescue rank.  0 = standard drop semantics.
    rescue_ranks: int = 0


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


def _topk_dispatch(probs, e: int, cap: int, top_k: int, rescue_ranks: int = 0):
    """Static-shape top-k routing.

    Returns (dispatch (T, E, cap) one-hot weights, combine (T, E, cap)
    gate-weighted, first-choice onehot (T, E) for the aux loss).

    Queues fill in choice-rank order: rank-0 assignments for ALL tokens are
    seated first, then rank-1 competes for the remaining slots (GShard).
    Gates are renormalized over the token's KEPT experts.

    rescue_ranks > 0 adds overflow-rescue rounds: tokens that did not get
    ANY seat compete (in the same cumsum machinery) for the remaining
    capacity of their next-preference experts — seated capacity counts
    carry over, so rescue can never evict or exceed cap.
    """
    t = probs.shape[0]
    n_ranks = top_k + rescue_ranks
    top_probs, top_idx = jax.lax.top_k(probs, n_ranks)  # (T, ranks) — tiny
    onehots = [jax.nn.one_hot(top_idx[:, r], e, dtype=jnp.float32) for r in range(n_ranks)]

    # seat tokens: cumulative per-expert counts carry across ranks
    base = jnp.zeros((e,), jnp.float32)
    seated = jnp.zeros((t,), jnp.bool_)
    dispatches, gates = [], []
    for r in range(n_ranks):
        oh = onehots[r]
        if r >= top_k:
            # rescue round: only completely-dropped tokens participate
            oh = oh * (~seated)[:, None].astype(jnp.float32)
        position = (jnp.cumsum(oh, axis=0) - 1.0) * oh + base[None, :] * oh
        pos_in_expert = jnp.sum(position, axis=-1)  # (T,)
        keep = (pos_in_expert < cap) & (jnp.sum(oh, axis=-1) > 0)
        slot = jax.nn.one_hot(pos_in_expert.astype(jnp.int32), cap, dtype=jnp.float32)
        dispatches.append(oh[:, :, None] * slot[:, None, :] * keep[:, None, None])
        gates.append(top_probs[:, r] * keep)
        seated = seated | keep
        base = base + jnp.sum(oh, axis=0)

    # renormalize gates over kept choices (sum of kept probs)
    denom = sum(gates)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    dispatch = sum(dispatches)
    combine = sum(dsp * (g / denom)[:, None, None] for dsp, g in zip(dispatches, gates))
    return dispatch, combine, onehots[0]


def moe_ffn(x, params, cfg: MoEConfig):
    """x: (B, S, D) -> (B, S, D), plus the load-balancing aux loss.

    Returns (out, aux_loss).
    """
    b, s, d = x.shape
    n_tokens = b * s
    e = cfg.n_experts
    cap = max(1, int(cfg.capacity_factor * cfg.top_k * n_tokens / e))

    xt = x.reshape(n_tokens, d)
    logits = jnp.dot(
        xt.astype(jnp.float32), params["router"], preferred_element_type=jnp.float32
    )  # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    dispatch, combine, onehot1 = _topk_dispatch(
        probs, e, cap, cfg.top_k, cfg.rescue_ranks
    )

    # route tokens to expert buffers: (E, cap, D) — all-to-all under ep sharding
    expert_in = jnp.einsum("tec,td->ecd", dispatch, xt.astype(jnp.float32))
    # expert FFN (batched over E: MXU-batched matmuls, shardable over ep)
    h = jax.nn.gelu(
        jnp.einsum("ecd,edf->ecf", expert_in, params["w_in"], preferred_element_type=jnp.float32)
    )
    expert_out = jnp.einsum(
        "ecf,efd->ecd", h, params["w_out"], preferred_element_type=jnp.float32
    )
    # combine back, weighted by the renormalized gates
    out = jnp.einsum("tec,ecd->td", combine, expert_out)

    # Switch load-balancing loss over FIRST choices:
    # E * sum_e (fraction_tokens_e * mean_prob_e)
    frac_tokens = jnp.mean(onehot1, axis=0)
    mean_probs = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac_tokens * mean_probs)
    return out.astype(x.dtype).reshape(b, s, d), aux


# ---------------------------------------------------------------------------
# expert-parallel MoE with EXPLICIT all-to-all (shard_map manual collectives)
# ---------------------------------------------------------------------------


def moe_ffn_ep_spmd(x_local, params_local, cfg: MoEConfig, *, axis: str = "ep"):
    """Runs INSIDE shard_map over `axis` (expert parallelism).

    x_local: (B_local, S, D) — tokens sharded over the axis (dp-style);
    params_local: router replicated, w_in/w_out sharded E-over-axis
    (leaves carry the LOCAL expert slice, E_local = E / n_dev).

    The dispatch/combine all-to-alls are EXPLICIT jax.lax.all_to_all calls
    (the manual form of what GSPMD infers for the replicated moe_ffn):

      dispatch einsum -> (E, cap_local, D) per device
        -> all_to_all splits E into device groups and concats the sender
           dim: every device ends with (E_local, n_dev * cap_local, D) —
           its own experts' queues from every sender, riding ICI
      expert FFN on local experts only
        -> reverse all_to_all returns each sender's slots -> combine.

    Returns (out_local (B_local, S, D), aux_loss_local).
    """
    n_dev = jax.lax.psum(1, axis)
    b, s, d = x_local.shape
    t = b * s
    e = cfg.n_experts
    assert e % n_dev == 0, (e, n_dev)
    cap = max(1, int(cfg.capacity_factor * cfg.top_k * t / e))

    xt = x_local.reshape(t, d)
    logits = jnp.dot(
        xt.astype(jnp.float32), params_local["router"], preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1)
    dispatch, combine, onehot1 = _topk_dispatch(
        probs, e, cap, cfg.top_k, cfg.rescue_ranks
    )

    # local expert queues for ALL experts: (E, cap, D)
    expert_in = jnp.einsum("tec,td->ecd", dispatch, xt.astype(jnp.float32))
    # explicit dispatch all-to-all, tiled form: the expert dim (E =
    # n_dev * E_local, device-major) splits across devices and every
    # sender's queues concatenate along the capacity dim ->
    # (E_local, n_dev * cap, D).  (The tiled=False + reshape spelling is
    # forward-equivalent but its TRANSPOSE miscomputes shapes when
    # E_local > 1 — a lowering verifier error under jax.grad.)
    el = e // n_dev
    expert_in = jax.lax.all_to_all(
        expert_in, axis, split_axis=0, concat_axis=1, tiled=True,
    )  # (E_local, n_dev * cap, D)

    h = jax.nn.gelu(
        jnp.einsum(
            "ecd,edf->ecf", expert_in, params_local["w_in"],
            preferred_element_type=jnp.float32,
        )
    )
    expert_out = jnp.einsum(
        "ecf,efd->ecd", h, params_local["w_out"], preferred_element_type=jnp.float32
    )

    # reverse all-to-all (tiled): each sender's cap-slice returns home and
    # the expert dim re-concatenates device-major -> (E, cap, D) locally
    expert_out = jax.lax.all_to_all(
        expert_out, axis, split_axis=1, concat_axis=0, tiled=True,
    )

    out = jnp.einsum("tec,ecd->td", combine, expert_out)
    frac_tokens = jnp.mean(onehot1, axis=0)
    mean_probs = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac_tokens * mean_probs)
    return out.astype(x_local.dtype).reshape(b, s, d), aux


def make_moe_ffn_ep(mesh, cfg: MoEConfig, *, ep_axis: str = "ep"):
    """fn(x, params) with GLOBAL shapes: tokens sharded over `ep_axis`,
    expert weights sharded E-over-`ep_axis`, router replicated; the
    dispatch/combine collectives are explicit all_to_alls."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        partial(moe_ffn_ep_spmd, cfg=cfg, axis=ep_axis),
        mesh=mesh,
        in_specs=(
            P(ep_axis),  # tokens (batch dim)
            {"router": P(), "w_in": P(ep_axis), "w_out": P(ep_axis)},
        ),
        out_specs=(P(ep_axis), P()),
        axis_names=frozenset({ep_axis}),
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# expert-choice routing (round 3): experts pick tokens, not tokens experts
# ---------------------------------------------------------------------------


def expert_choice_ffn(x, params, cfg: MoEConfig):
    """Expert-choice MoE (Zhou et al. 2022): each expert selects its own
    top-capacity tokens by router affinity, instead of tokens competing for
    expert capacity.

    Properties that make it TPU-first and production-attractive:
      * PERFECT load balance by construction — every expert processes
        exactly `capacity` tokens, so no aux loss, no overflow drops, no
        rescue pass;
      * static shapes fall out directly (top_k over the token axis);
      * a token may be chosen by several experts (outputs sum, weighted by
        the router gate) or by none (its FFN contribution is zero — the
        residual stream still carries it).

    Returns (out, aux) with aux = 0.0 (kept for interface parity with
    moe_ffn's load-balancing loss).
    """
    b, s, d = x.shape
    n_tokens = b * s
    e = cfg.n_experts
    cap = max(1, int(cfg.capacity_factor * cfg.top_k * n_tokens / e))
    cap = min(cap, n_tokens)

    xt = x.reshape(n_tokens, d)
    logits = jnp.dot(
        xt.astype(jnp.float32), params["router"], preferred_element_type=jnp.float32
    )  # (T, E)
    # gates over experts per token (softmax), then experts pick tokens
    probs = jax.nn.softmax(logits, axis=-1)
    gates, idx = jax.lax.top_k(probs.T, cap)  # (E, cap): each expert's tokens

    # dispatch: gather each expert's chosen tokens
    expert_in = xt.astype(jnp.float32)[idx]  # (E, cap, D)
    hmid = jax.nn.gelu(
        jnp.einsum("ecd,edf->ecf", expert_in, params["w_in"],
                   preferred_element_type=jnp.float32)
    )
    expert_out = jnp.einsum(
        "ecf,efd->ecd", hmid, params["w_out"], preferred_element_type=jnp.float32
    )
    # combine: scatter-add gate-weighted outputs back to token positions
    weighted = expert_out * gates[:, :, None]
    out = jnp.zeros((n_tokens, d), jnp.float32).at[idx.reshape(-1)].add(
        weighted.reshape(-1, d)
    )
    return out.astype(x.dtype).reshape(b, s, d), jnp.float32(0.0)
