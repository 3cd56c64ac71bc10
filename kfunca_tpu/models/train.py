"""Training step: loss -> grad -> AdamW, single-chip or mesh-sharded.

Green-field capability (the reference has no training loop).  The optimizer
is hand-rolled AdamW over the params pytree — fp32 master params + moments,
fully jit-compatible, shardable by the same NamedShardings as the params
(optimizer state inherits the param sharding, so dp replicates and tp shards
moments exactly like weights).  Production recipe knobs: linear-warmup +
cosine-decay LR schedule, global-norm gradient clipping, and the standard
no-decay mask for 1-D params (norm gains / biases).
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
    # schedule: linear warmup over `warmup_steps`, then cosine decay to
    # lr * min_lr_frac at `total_steps` (total_steps=None -> constant lr)
    warmup_steps: int = 0
    total_steps: int | None = None
    min_lr_frac: float = 0.1
    # global-norm gradient clipping (None -> off)
    clip_norm: float | None = None
    # skip weight decay on 1-D params (norm gains, biases) — the standard
    # transformer recipe; False decays everything (legacy behavior)
    decay_mask_1d: bool = True


def schedule_lr(oc: OptConfig, step):
    """lr at `step` (1-based, traced ok): warmup -> cosine -> floor."""
    t = step.astype(jnp.float32) if hasattr(step, "astype") else jnp.float32(step)
    lr = jnp.float32(oc.lr)
    if oc.warmup_steps > 0:
        lr = lr * jnp.minimum(1.0, t / jnp.float32(oc.warmup_steps))
    if oc.total_steps is not None:
        frac = (t - oc.warmup_steps) / jnp.float32(
            max(1, oc.total_steps - oc.warmup_steps)
        )
        frac = jnp.clip(frac, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        floor = jnp.float32(oc.min_lr_frac)
        lr = lr * (floor + (1.0 - floor) * cos)
    return lr


def global_norm(grads):
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(
        sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves)
    )


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
    lr = schedule_lr(oc, step)

    gscale = jnp.float32(1.0)
    if oc.clip_norm is not None:
        gn = global_norm(grads)
        gscale = jnp.minimum(1.0, jnp.float32(oc.clip_norm) / (gn + 1e-12))

    def upd(p, g, m, v):
        g = g.astype(jnp.float32) * gscale
        m = oc.beta1 * m + (1 - oc.beta1) * g
        v = oc.beta2 * v + (1 - oc.beta2) * g * g
        mh = m / bc1
        vh = v / bc2
        wd = oc.weight_decay if (p.ndim >= 2 or not oc.decay_mask_1d) else 0.0
        new_p = p - lr * (mh / (jnp.sqrt(vh) + oc.eps) + wd * p)
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
