"""Training step: loss -> grad -> optimizer update, single-chip or sharded.

Green-field capability (the reference has no training loop).  The optimizer
zoo is hand-rolled over the params pytree — adamw (default), sgd w/ nesterov,
lion, and adafactor (factored second moments) — fp32 master params + moments,
fully jit-compatible, shardable by the same NamedShardings as the params
(optimizer state inherits the param sharding, so dp replicates and tp shards
moments exactly like weights; fsdp=True shards both over dp as well, ZeRO-3).
Production recipe knobs: linear-warmup + cosine-decay LR schedule, global-norm
gradient clipping, the standard no-decay mask for 1-D params (norm gains /
biases), and in-step gradient accumulation (grad_accum microbatches under one
lax.scan).
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from ..parallel import mesh as meshlib
from .transformer import TransformerConfig, loss_fn, loss_fn_chunked


@dataclass(frozen=True)
class OptConfig:
    # which update rule: "adamw" (default), "sgd" (momentum/nesterov),
    # "lion" (sign-momentum, half of adam's state), "adafactor"
    # (factored second moments — O(r+c) state per (r,c) matrix instead of
    # O(r*c); the large-model memory saver), or "muon" (Newton-Schulz
    # orthogonalized momentum for matrices — 5 matmul-only iterations, a
    # natural MXU fit; 1-D leaves fall back to adamw per the paper)
    algo: str = "adamw"
    lr: float = 3e-4
    beta1: float = 0.9
    beta2: float = 0.95
    eps: float = 1e-8
    weight_decay: float = 0.1
    # sgd knobs
    momentum: float = 0.9
    nesterov: bool = False
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
    # exponential moving average of params (None -> off): opt_state gains
    # an fp32 "ema" tree updated after every step; read it back with
    # ema_params(opt_state).  The standard eval/serving smoother.
    ema_decay: float | None = None
    # muon knob: momentum coefficient (paper default 0.95); muon's 1-D
    # fallback uses the adamw beta1/beta2/eps above
    muon_beta: float = 0.95
    # optimizer-moment STORAGE dtype: "float32" (default) or "bfloat16".
    # bf16 halves the m+v HBM traffic that dominates the update's cost
    # (the update itself is O(1) FLOPs/param — pure bandwidth); moments
    # still COMPUTE in fp32 every step (cast in, cast out).  The v-EMA
    # increment (1-beta2)*g^2 stays well above bf16's ~2^-8 relative ulp
    # for beta2 <= 0.99 (the LLM-standard 0.95 here); avoid for
    # beta2 >= 0.999 where increments round to zero.  Master params and
    # the EMA tree stay fp32 regardless.
    state_dtype: str = "float32"


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


def init_opt_state(params, oc: OptConfig | None = None):
    """Optimizer state for oc.algo (default adamw, the historical layout).

    adamw: fp32 m+v per param.  sgd / lion: m only.  adafactor: factored
    second moments — for ndim>=2 leaves, row means `vr` (shape[:-1]) and
    column means `vc` (shape[:-2]+(n,)) replace the full v (Shazeer &
    Stern 2018); ndim<2 leaves keep a full `v1`.  Unused slots hold ()
    scalars so every field stays a params-shaped pytree (tree_map- and
    sharding-friendly)."""
    algo = oc.algo if oc is not None else "adamw"
    sd = jnp.dtype(oc.state_dtype) if oc is not None else jnp.dtype(jnp.float32)
    zeros = lambda p: jnp.zeros_like(p, dtype=sd)
    state = {"step": jnp.zeros((), jnp.int32)}
    if algo in ("adamw", "sgd", "lion", "muon"):
        state["m"] = jax.tree_util.tree_map(zeros, params)
    if algo == "adamw":
        state["v"] = jax.tree_util.tree_map(zeros, params)
    if algo == "muon":
        # second moment only for the 1-D adamw fallback leaves
        dummy = jnp.zeros((), jnp.float32)
        state["v1"] = jax.tree_util.tree_map(
            lambda p: zeros(p) if p.ndim < 2 else dummy, params
        )
    if oc is not None and oc.ema_decay is not None:
        state["ema"] = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32), params
        )
    if algo == "adafactor":
        dummy = jnp.zeros((), jnp.float32)
        state["vr"] = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape[:-1], jnp.float32) if p.ndim >= 2 else dummy,
            params,
        )
        state["vc"] = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
            if p.ndim >= 2 else dummy,
            params,
        )
        state["v1"] = jax.tree_util.tree_map(
            lambda p: zeros(p) if p.ndim < 2 else dummy, params
        )
    return state


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
        sd = m.dtype  # storage dtype (OptConfig.state_dtype); compute fp32
        g = g.astype(jnp.float32) * gscale
        m = oc.beta1 * m.astype(jnp.float32) + (1 - oc.beta1) * g
        v = oc.beta2 * v.astype(jnp.float32) + (1 - oc.beta2) * g * g
        mh = m / bc1
        vh = v / bc2
        wd = oc.weight_decay if (p.ndim >= 2 or not oc.decay_mask_1d) else 0.0
        new_p = p - lr * (mh / (jnp.sqrt(vh) + oc.eps) + wd * p)
        return new_p, m.astype(sd), v.astype(sd)

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_m = jax.tree_util.tree_leaves(opt_state["m"])
    flat_v = jax.tree_util.tree_leaves(opt_state["v"])
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_params = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
    new_m = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
    new_v = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
    return new_params, {"step": step, "m": new_m, "v": new_v}


def _clip_and_lr(grads, opt_state, oc: OptConfig):
    step = opt_state["step"] + 1
    gscale = jnp.float32(1.0)
    if oc.clip_norm is not None:
        gn = global_norm(grads)
        gscale = jnp.minimum(1.0, jnp.float32(oc.clip_norm) / (gn + 1e-12))
    return step, schedule_lr(oc, step), gscale


def _wd(p, oc: OptConfig):
    return oc.weight_decay if (p.ndim >= 2 or not oc.decay_mask_1d) else 0.0


def _tree_zip_update(params, upd, *trees):
    """Apply upd(p, *leaves) leafwise; returns (new_params, per-output
    trees).  upd returns a tuple; output i is unflattened from slot i."""
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flats = [jax.tree_util.tree_leaves(t) for t in trees]
    out = [upd(p, *ls) for p, *ls in zip(flat_p, *flats)]
    n = len(out[0])
    return tuple(
        jax.tree_util.tree_unflatten(treedef, [o[i] for o in out]) for i in range(n)
    )


def sgd_update(params, grads, opt_state, oc: OptConfig):
    """SGD with momentum (optionally Nesterov) + decoupled weight decay."""
    step, lr, gscale = _clip_and_lr(grads, opt_state, oc)
    mu = jnp.float32(oc.momentum)

    def upd(p, g, m):
        sd = m.dtype
        g = g.astype(jnp.float32) * gscale
        m = mu * m.astype(jnp.float32) + g
        u = g + mu * m if oc.nesterov else m
        return p - lr * (u + _wd(p, oc) * p), m.astype(sd)

    new_params, new_m = _tree_zip_update(params, upd, grads, opt_state["m"])
    return new_params, {"step": step, "m": new_m}


def lion_update(params, grads, opt_state, oc: OptConfig):
    """Lion (Chen et al. 2023): sign of a beta1-interpolated momentum;
    half of adam's state (one moment), update magnitude == lr exactly."""
    step, lr, gscale = _clip_and_lr(grads, opt_state, oc)

    def upd(p, g, m):
        sd = m.dtype
        g = g.astype(jnp.float32) * gscale
        m32 = m.astype(jnp.float32)
        u = jnp.sign(oc.beta1 * m32 + (1 - oc.beta1) * g)
        m32 = oc.beta2 * m32 + (1 - oc.beta2) * g
        return p - lr * (u + _wd(p, oc) * p), m32.astype(sd)

    new_params, new_m = _tree_zip_update(params, upd, grads, opt_state["m"])
    return new_params, {"step": step, "m": new_m}


def adafactor_update(params, grads, opt_state, oc: OptConfig):
    """Adafactor (Shazeer & Stern 2018), momentum-free: factored second
    moments for matrices (row/col mean-square EMAs, O(r+c) state), full v
    for 1-D leaves; decay 1 - t^-0.8; update RMS-clipped at 1.0."""
    step, lr, gscale = _clip_and_lr(grads, opt_state, oc)
    t = step.astype(jnp.float32)
    b2 = 1.0 - t ** jnp.float32(-0.8)
    eps = jnp.float32(1e-30)

    def upd(p, g, vr, vc, v1):
        sd1 = v1.dtype
        g = g.astype(jnp.float32) * gscale
        g2 = g * g + eps
        if p.ndim >= 2:
            vr = b2 * vr + (1 - b2) * jnp.mean(g2, axis=-1)
            vc = b2 * vc + (1 - b2) * jnp.mean(g2, axis=-2)
            # rank-1 reconstruction, normalized by the shared total mean
            denom = jnp.mean(vr, axis=-1, keepdims=True)
            vhat = vr[..., :, None] * vc[..., None, :] / denom[..., None]
        else:
            v1 = b2 * v1.astype(jnp.float32) + (1 - b2) * g2
            vhat = v1
        u = g / jnp.sqrt(vhat)
        # clip the update's RMS to 1.0 (the paper's d=1 stabilizer)
        rms_u = jnp.sqrt(jnp.mean(u * u) + eps)
        u = u / jnp.maximum(1.0, rms_u)
        return p - lr * (u + _wd(p, oc) * p), vr, vc, v1.astype(sd1)

    new_params, vr, vc, v1 = _tree_zip_update(
        params, upd, grads, opt_state["vr"], opt_state["vc"], opt_state["v1"]
    )
    return new_params, {"step": step, "vr": vr, "vc": vc, "v1": v1}


def _newton_schulz5(g, steps: int = 5):
    """Approximate orthogonalization of a (..., r, c) matrix: 5 iterations
    of the quintic Newton-Schulz polynomial (Jordan et al. 2024's Muon
    coefficients) on the Frobenius-normalized input.  Pure matmuls — runs
    on the MXU; computed in fp32 (bf16 also works per the paper but the
    master params here are fp32 anyway)."""
    a, b, c = 3.4445, -4.7750, 2.0315
    x = g / (jnp.linalg.norm(g, axis=(-2, -1), keepdims=True) + 1e-7)
    transposed = x.shape[-2] > x.shape[-1]
    if transposed:  # iterate on the wide orientation: A is (r, r) minimal
        x = jnp.swapaxes(x, -2, -1)
    for _ in range(steps):
        A = x @ jnp.swapaxes(x, -2, -1)
        B = b * A + c * (A @ A)
        x = a * x + B @ x
    return jnp.swapaxes(x, -2, -1) if transposed else x


def muon_update(params, grads, opt_state, oc: OptConfig):
    """Muon (Jordan et al. 2024): nesterov momentum orthogonalized by
    Newton-Schulz for every >=2-D param, scaled by sqrt(max(1, r/c)) to
    keep per-row update RMS ~1 like adam; ndim<2 leaves (norm gains,
    biases) run the standard adamw rule, as the paper prescribes."""
    step, lr, gscale = _clip_and_lr(grads, opt_state, oc)
    mu = jnp.float32(oc.muon_beta)
    t = step.astype(jnp.float32)
    bc1 = 1.0 - oc.beta1**t
    bc2 = 1.0 - oc.beta2**t

    def upd(p, g, m, v1):
        sd = m.dtype
        g = g.astype(jnp.float32) * gscale
        if p.ndim >= 2:
            m32 = mu * m.astype(jnp.float32) + g
            o = _newton_schulz5(g + mu * m32)  # nesterov-style lookahead
            scale = jnp.sqrt(jnp.maximum(1.0, p.shape[-2] / p.shape[-1]))
            return p - lr * (scale * o + _wd(p, oc) * p), m32.astype(sd), v1
        m32 = oc.beta1 * m.astype(jnp.float32) + (1 - oc.beta1) * g
        v32 = oc.beta2 * v1.astype(jnp.float32) + (1 - oc.beta2) * g * g
        u = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + oc.eps)
        return (p - lr * (u + _wd(p, oc) * p), m32.astype(sd),
                v32.astype(v1.dtype))

    new_params, new_m, new_v1 = _tree_zip_update(
        params, upd, grads, opt_state["m"], opt_state["v1"]
    )
    return new_params, {"step": step, "m": new_m, "v1": new_v1}


_UPDATES = {
    "adamw": adamw_update,
    "sgd": sgd_update,
    "lion": lion_update,
    "adafactor": adafactor_update,
    "muon": muon_update,
}


def apply_update(params, grads, opt_state, oc: OptConfig):
    """Dispatch to oc.algo's update rule (state from init_opt_state(p, oc));
    maintains the params EMA afterwards when oc.ema_decay is set."""
    try:
        fn = _UPDATES[oc.algo]
    except KeyError:
        raise ValueError(
            f"unknown optimizer algo {oc.algo!r}; one of {sorted(_UPDATES)}"
        ) from None
    new_params, new_state = fn(params, grads, opt_state, oc)
    if oc.ema_decay is not None:
        d = jnp.float32(oc.ema_decay)
        new_state["ema"] = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * p.astype(jnp.float32),
            opt_state["ema"], new_params,
        )
    return new_params, new_state


def ema_params(opt_state, dtype=None):
    """The EMA params tree (requires OptConfig(ema_decay=...)); cast to
    `dtype` if given — the smoothed weights for eval/serving."""
    ema = opt_state["ema"]
    if dtype is not None:
        ema = jax.tree_util.tree_map(lambda e: e.astype(dtype), ema)
    return ema


def make_train_step(cfg: TransformerConfig, oc: OptConfig = OptConfig(),
                    grad_accum: int = 1, loss_chunk: int | None = None,
                    ignore_index: int | None = None,
                    with_metrics: bool = False):
    """Returns train_step(params, opt_state, tokens, targets) -> (params,
    opt_state, loss); jit it yourself (optionally with shardings).

    grad_accum > 1 splits the batch into that many microbatches and runs
    them through a lax.scan, accumulating fp32 gradient sums before ONE
    optimizer update — the standard way to train with an effective batch
    larger than fits in HBM.  Equivalent to the single full-batch step up
    to summation order (loss_fn means over the batch, so the mean of
    microbatch grads == the full-batch grad).  Activations live for one
    microbatch at a time; the fp32 grad accumulator is the extra memory.

    loss_chunk streams the LM head in vocab chunks of that width instead of
    materializing (B, S, vocab) logits (transformer.loss_fn_chunked) —
    same loss/grads, peak memory bounded by B*S*loss_chunk.

    ignore_index masks loss positions whose target equals it (padding /
    prompt tokens in SFT); the mean runs over unmasked tokens only.

    with_metrics=True returns a metrics dict in place of the scalar loss:
    {"loss", "grad_norm" (pre-clip), "lr" (this step's scheduled rate),
    "step"} — the standard training-log quantities, computed inside the
    one compiled step (no extra device round-trips)."""

    if loss_chunk is None:
        def loss(params, tokens, targets, cfg):
            return loss_fn(params, tokens, targets, cfg,
                           ignore_index=ignore_index)
    else:
        def loss(params, tokens, targets, cfg):
            return loss_fn_chunked(params, tokens, targets, cfg, loss_chunk,
                                   ignore_index=ignore_index)

    def _stats(loss_v, grads, opt_state):
        if not with_metrics:
            return loss_v
        step = opt_state["step"] + 1
        return {
            "loss": loss_v,
            "grad_norm": global_norm(grads),
            "lr": schedule_lr(oc, step),
            "step": step,
        }

    def full_batch_step(params, opt_state, tokens, targets):
        loss_v, grads = jax.value_and_grad(loss)(params, tokens, targets, cfg)
        stats = _stats(loss_v, grads, opt_state)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, stats

    if grad_accum <= 1:
        return full_batch_step

    def accum_step(params, opt_state, tokens, targets):
        b = tokens.shape[0]
        if b % grad_accum:
            raise ValueError(f"batch {b} not divisible by grad_accum={grad_accum}")
        mb = b // grad_accum
        tok_mb = tokens.reshape(grad_accum, mb, *tokens.shape[1:])
        tgt_mb = targets.reshape(grad_accum, mb, *targets.shape[1:])

        def body(carry, xt):
            g_acc, l_acc = carry
            t, tg = xt
            loss_v, g = jax.value_and_grad(loss)(params, t, tg, cfg)
            g_acc = jax.tree_util.tree_map(
                lambda a, x: a + x.astype(jnp.float32), g_acc, g
            )
            return (g_acc, l_acc + loss_v), None

        g0 = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        (g_sum, l_sum), _ = jax.lax.scan(body, (g0, jnp.float32(0.0)), (tok_mb, tgt_mb))
        inv = jnp.float32(1.0 / grad_accum)
        grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
        stats = _stats(l_sum * inv, grads, opt_state)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, stats

    return accum_step


def make_sharded_train_step(cfg: TransformerConfig, mesh, oc: OptConfig = OptConfig(),
                            fsdp: bool = False, grad_accum: int = 1,
                            loss_chunk: int | None = None,
                            ignore_index: int | None = None,
                            with_metrics: bool = False):
    """jit the train step over a (dp, tp) mesh: params/opt-state tp-sharded,
    batch dp-sharded; XLA GSPMD inserts the gradient psum over dp and the
    tp collectives (scaling-book recipe).

    fsdp=True turns on ZeRO-3: params AND optimizer state shard their
    tp-free matrix axis over dp too (see parallel.mesh.param_specs), so
    per-chip state memory drops by the dp factor; XLA all-gathers weights
    per layer and reduce-scatters grads.  grad_accum microbatches the
    batch inside the step (see make_train_step)."""
    from jax.sharding import NamedSharding

    step = make_train_step(cfg, oc, grad_accum=grad_accum,
                           loss_chunk=loss_chunk, ignore_index=ignore_index,
                           with_metrics=with_metrics)

    def in_shardings(params):
        P = jax.sharding.PartitionSpec
        pspecs = meshlib.param_specs(params, fsdp=fsdp)
        to_sharding = lambda s: NamedSharding(mesh, s)
        is_spec = lambda x: not isinstance(x, (dict, list))
        p_sh = jax.tree_util.tree_map(to_sharding, pspecs, is_leaf=is_spec)
        repl = NamedSharding(mesh, P())
        opt_sh = {"step": repl}
        if oc.algo in ("adamw", "sgd", "lion", "muon"):
            opt_sh["m"] = p_sh  # moments shard exactly like their params
        if oc.algo == "adamw":
            opt_sh["v"] = p_sh
        if oc.algo == "muon":
            opt_sh["v1"] = jax.tree_util.tree_map(
                lambda spec, p: to_sharding(spec) if p.ndim < 2 else repl,
                pspecs, params, is_leaf=is_spec,
            )
        if oc.ema_decay is not None:
            opt_sh["ema"] = p_sh
        if oc.algo == "adafactor":
            # factored moments drop one param axis: vr loses the last
            # (column) axis, vc the second-to-last (row) axis; ndim<2
            # leaves carry () dummies / full v1 with the param's spec
            def axis_drop(keep_last):
                def f(spec, p):
                    if p.ndim < 2:
                        return repl
                    s = tuple(spec) + (None,) * (p.ndim - len(tuple(spec)))
                    kept = s[:-2] + ((s[-1],) if keep_last else (s[-2],))
                    return NamedSharding(mesh, P(*kept))
                return f
            opt_sh["vr"] = jax.tree_util.tree_map(
                axis_drop(False), pspecs, params, is_leaf=is_spec
            )
            opt_sh["vc"] = jax.tree_util.tree_map(
                axis_drop(True), pspecs, params, is_leaf=is_spec
            )
            opt_sh["v1"] = jax.tree_util.tree_map(
                lambda spec, p: to_sharding(spec) if p.ndim < 2 else repl,
                pspecs, params, is_leaf=is_spec,
            )
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
