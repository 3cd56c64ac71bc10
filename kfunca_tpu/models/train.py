"""Training step: loss -> grad -> AdamW, single-chip or mesh-sharded.

Green-field capability (the reference has no training loop).  The optimizer
is hand-rolled AdamW over the params pytree — fp32 master params + moments,
fully jit-compatible, shardable by the same NamedShardings as the params
(optimizer state inherits the param sharding, so dp replicates and tp shards
moments exactly like weights).
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from ..parallel import mesh as meshlib
from .transformer import TransformerConfig, loss_fn


@dataclass(frozen=True)
class OptConfig:
    lr: float = 3e-4
    beta1: float = 0.9
    beta2: float = 0.95
    eps: float = 1e-8
    weight_decay: float = 0.1


def init_opt_state(params):
    zeros = lambda p: jnp.zeros_like(p)
    return {
        "step": jnp.zeros((), jnp.int32),
        "m": jax.tree_util.tree_map(zeros, params),
        "v": jax.tree_util.tree_map(zeros, params),
    }


def adamw_update(params, grads, opt_state, oc: OptConfig):
    step = opt_state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - oc.beta1**t
    bc2 = 1.0 - oc.beta2**t

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        m = oc.beta1 * m + (1 - oc.beta1) * g
        v = oc.beta2 * v + (1 - oc.beta2) * g * g
        mh = m / bc1
        vh = v / bc2
        new_p = p - oc.lr * (mh / (jnp.sqrt(vh) + oc.eps) + oc.weight_decay * p)
        return new_p, m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_m = jax.tree_util.tree_leaves(opt_state["m"])
    flat_v = jax.tree_util.tree_leaves(opt_state["v"])
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_params = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
    new_m = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
    new_v = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
    return new_params, {"step": step, "m": new_m, "v": new_v}


def make_train_step(cfg: TransformerConfig, oc: OptConfig = OptConfig()):
    """Returns train_step(params, opt_state, tokens, targets) -> (params,
    opt_state, loss); jit it yourself (optionally with shardings)."""

    def train_step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets, cfg)
        params, opt_state = adamw_update(params, grads, opt_state, oc)
        return params, opt_state, loss

    return train_step


def make_sharded_train_step(cfg: TransformerConfig, mesh, oc: OptConfig = OptConfig()):
    """jit the train step over a (dp, tp) mesh: params/opt-state tp-sharded,
    batch dp-sharded; XLA GSPMD inserts the gradient psum over dp and the
    tp collectives (scaling-book recipe)."""
    from jax.sharding import NamedSharding

    step = make_train_step(cfg, oc)

    def in_shardings(params):
        pspecs = meshlib.param_specs(params)
        to_sharding = lambda s: NamedSharding(mesh, s)
        p_sh = jax.tree_util.tree_map(
            to_sharding, pspecs, is_leaf=lambda x: not isinstance(x, (dict, list))
        )
        opt_sh = {"step": NamedSharding(mesh, jax.sharding.PartitionSpec()), "m": p_sh, "v": p_sh}
        batch_sh = NamedSharding(mesh, meshlib.batch_spec())
        return (p_sh, opt_sh, batch_sh, batch_sh)

    def jitted_for(params):
        shardings = in_shardings(params)
        return jax.jit(
            step,
            in_shardings=shardings,
            out_shardings=(shardings[0], shardings[1], NamedSharding(mesh, jax.sharding.PartitionSpec())),
        )

    return jitted_for
