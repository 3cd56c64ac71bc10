"""Device-mesh scale-out: dp x tp meshes with sequence-parallel activations.

Green-field capability (the reference is strictly single-device; SURVEY.md
§2.5): parallelism is expressed the TPU-native way — a jax.sharding.Mesh,
NamedSharding annotations on params/activations, and XLA GSPMD inserting the
ICI collectives (all-gather/reduce-scatter/psum).  No hand-written NCCL-style
communication: the scaling-book recipe is "pick a mesh, annotate shardings,
let XLA insert collectives".

Axes:
  dp — data parallel: batch dim; gradients psum across dp (via GSPMD).
  tp — tensor parallel: attention heads / ffn dim (Megatron-style column->row
       sharded pairs so each block needs exactly one all-reduce per matmul
       pair); between blocks, activations are re-sharded along the *sequence*
       dim over tp (sequence parallelism) so norms/elementwise run sharded.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor_mesh(n: int) -> tuple[int, int]:
    """Split n devices into (dp, tp), preferring square-ish with tp a power
    of two (tp rides ICI-adjacent chips)."""
    best = (n, 1)
    tp = 1
    while tp * 2 <= n:
        tp *= 2
        if n % tp == 0:
            dp = n // tp
            if abs(math.log2(max(dp, 1)) - math.log2(tp)) <= abs(
                math.log2(max(best[0], 1)) - math.log2(max(best[1], 1))
            ):
                best = (dp, tp)
    return best


def make_mesh(n_devices: int | None = None, dp: int | None = None, tp: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if dp is None or tp is None:
        dp, tp = factor_mesh(n)
    assert dp * tp == n, (dp, tp, n)
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# -- sharding rules for the transformer param pytree ---------------------------


def param_specs(params, fsdp: bool = False) -> dict:
    """Megatron-style TP sharding: qkv/gate/up column-parallel (shard the
    output dim), wo/down row-parallel (shard the input dim), embeddings
    sharded over d_model, norms replicated.

    fsdp=True additionally shards every matrix's tp-free axis over "dp"
    (ZeRO-3 / fully-sharded data parallel, the GSPMD way): each chip holds
    1/(dp*tp) of every weight AND of its optimizer state (the state
    inherits the param spec in make_sharded_train_step).  XLA inserts the
    all-gather before each matmul and reduce-scatters the grads — no
    hand-written collectives.  Norms/biases stay replicated (tiny)."""

    def _with_dp(spec: P) -> P:
        s = list(spec)
        for i, ax in enumerate(s):
            if ax is None:
                s[i] = "dp"
                return P(*s)
        return spec

    maybe_dp = _with_dp if fsdp else (lambda s: s)

    def block_spec(blk):
        s = {
            "attn_norm": P(),
            "wo": maybe_dp(P("tp", None)),
            "mlp_norm": P(),
        }
        if "w_dkv" in blk:  # MLA (models/mla.py): down-projections to the
            # shared latent replicate (their outputs are per-position, not
            # per-head); up-projections are column-parallel over heads,
            # wo row-parallel — the Megatron pattern on the expanded side
            s["w_dkv"] = maybe_dp(P(None, None))
            s["kv_norm"] = P()
            s["w_uk"] = maybe_dp(P(None, "tp"))
            s["w_uv"] = maybe_dp(P(None, "tp"))
            if "w_q" in blk:
                s["w_q"] = maybe_dp(P(None, "tp"))
            else:
                s["w_dq"] = maybe_dp(P(None, None))
                s["q_norm"] = P()
                s["w_uq"] = maybe_dp(P(None, "tp"))
        else:
            s["wqkv"] = maybe_dp(P(None, "tp"))
            if "q_norm" in blk:  # Qwen3 per-head q/k norms: (head_dim,)
                s["q_norm"] = P()  # shared by every head -> replicate
                s["k_norm"] = P()
        if "experts" in blk:  # MoE: each expert shards like a dense MLP;
            s["router"] = P()  # the tiny router replicates
            if "router_bias" in blk:  # DeepSeek selection bias: tiny
                s["router_bias"] = P()
            s["experts"] = [
                {
                    "w_gate": maybe_dp(P(None, "tp")),
                    "w_up": maybe_dp(P(None, "tp")),
                    "w_down": maybe_dp(P("tp", None)),
                }
                for _ in blk["experts"]
            ]
            if "shared" in blk:  # DeepSeek shared experts: dense MLP pair
                s["shared"] = {
                    "w_gate": maybe_dp(P(None, "tp")),
                    "w_up": maybe_dp(P(None, "tp")),
                    "w_down": maybe_dp(P("tp", None)),
                }
        elif "w_fc" in blk:  # GPT-2-family GELU MLP
            s["w_fc"] = maybe_dp(P(None, "tp"))
            s["w_proj"] = maybe_dp(P("tp", None))
        else:
            s["w_gate"] = maybe_dp(P(None, "tp"))
            s["w_up"] = maybe_dp(P(None, "tp"))
            s["w_down"] = maybe_dp(P("tp", None))
        if "bqkv" in blk:
            s["bqkv"] = P("tp")
        if "b_fc" in blk:
            s["b_fc"] = P("tp")  # column-parallel bias
        for name in ("bo", "b_proj", "attn_norm_b", "mlp_norm_b"):
            if name in blk:  # row-parallel biases / norm biases: replicated
                s[name] = P()
        return s

    out = {
        "embed": maybe_dp(P(None, "tp")),
        "final_norm": P(),
        "blocks": [block_spec(b) for b in params["blocks"]],
    }
    if "lm_head" in params:
        out["lm_head"] = maybe_dp(P(None, "tp"))
    if "pos_embed" in params:
        out["pos_embed"] = P()
    if "final_norm_b" in params:
        out["final_norm_b"] = P()
    return out


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    specs = param_specs(params, fsdp=fsdp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )


def batch_spec() -> P:
    return P("dp", None)


def activation_spec() -> P:
    """(B, S, D) activations between blocks: batch over dp, sequence over tp
    (sequence parallelism)."""
    return P("dp", "tp", None)


def constrain_seq_parallel(x, mesh: Mesh):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, activation_spec()))
