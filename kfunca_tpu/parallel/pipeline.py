"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

Green-field capability (the reference is single-device).  TPU-native
construction: the pipeline is an SPMD program under `shard_map` over the
"pp" mesh axis — activations hop stage-to-stage with `jax.lax.ppermute`
(ICI neighbor transfers), the schedule is a static `lax.scan` over
M + S - 1 ticks, and reverse-mode AD of the whole thing (scan + ppermute
are both differentiable) yields the backward pipeline automatically — the
1F1B-ish reverse schedule falls out of the transposed collective rather
than being hand-scheduled.

Other mesh axes (dp, tp) stay in GSPMD "auto" mode inside the shard_map, so
tensor-parallel matmuls keep their compiler-inserted collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def stack_stages(block_params: list, n_stages: int):
    """Stack per-layer param pytrees into stage-major arrays: a list of L
    layer-pytrees becomes one pytree whose leaves carry a leading
    (n_stages, layers_per_stage) axis; axis 0 is sharded over pp."""
    n_layers = len(block_params)
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    per = n_layers // n_stages
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *block_params)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages, per) + x.shape[1:]), stacked
    )


def pipeline_spmd(stage_block_fn, stacked_params, x_mb, *, axis: str = "pp", remat: bool = False):
    """Runs INSIDE shard_map over `axis`.

    stage_block_fn(layer_params, x) applies ONE layer.
    stacked_params: local shard — leaves have leading (1, per_stage) axis.
    x_mb: (M, mb, S, D) embedded microbatches (same on every stage; only
    stage 0's copy is consumed).
    Returns (M, mb, S, D) final-stage outputs, broadcast to all stages.

    remat=True checkpoints each stage application: the backward pipeline
    (the AD transpose of this scan) then stores only the per-tick stage
    INPUTS and recomputes layer activations on the fly — the microbatch
    remat policy that bounds pipeline activation memory at M x (mb, S, D)
    per stage instead of M x per-layer intermediates.
    """
    n_stages = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    m = x_mb.shape[0]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    local_params = jax.tree_util.tree_map(lambda x: x[0], stacked_params)  # (per, ...)

    def apply_stage(x):
        def body(h, layer_params):
            return stage_block_fn(layer_params, h), None

        h, _ = jax.lax.scan(body, x, local_params)
        return h

    if remat:
        apply_stage = jax.checkpoint(apply_stage)

    def tick(state, t):
        inp = jax.lax.ppermute(state, axis, perm)  # receive from the left stage
        mb = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, m - 1), axis=0, keepdims=False
        )
        feed = jnp.logical_and(idx == 0, t < m)
        inp = jnp.where(feed, mb, inp)
        new_state = apply_stage(inp)
        return new_state, new_state

    init = jnp.zeros_like(x_mb[0])
    _, ys = jax.lax.scan(tick, init, jnp.arange(m + n_stages - 1))
    outs = ys[n_stages - 1 :]  # (M, mb, S, D): valid on the last stage only
    # broadcast the last stage's outputs to every pp rank (differentiable).
    # psum in f32: XLA-CPU's AllReducePromotion pass crashes on bf16
    # all-reduce (compiler bug), and f32 summation is harmless here.
    is_last = (idx == n_stages - 1).astype(jnp.float32)
    return jax.lax.psum(outs.astype(jnp.float32) * is_last, axis).astype(outs.dtype)


def make_pipelined_forward(block_fn, mesh, *, pp_axis: str = "pp", remat: bool = False):
    """Wrap `block_fn(layer_params, x)` into a pipelined multi-layer apply:

        fn(stacked_params, x_microbatches) -> final activations (M, mb, S, D)

    shard_map is manual over pp only; dp/tp stay compiler-managed (auto).

    Schedule note: the forward is GPipe ticks; the BACKWARD schedule is the
    AD transpose of the scan+ppermute program, which reverses the pipeline
    automatically (cool-down then warm-up) — the same dependency structure
    a hand-written 1F1B realizes.  What 1F1B buys beyond this is activation
    memory, which `remat=True` bounds instead (store stage inputs only,
    recompute layer intermediates in the backward).
    """
    # axis_names={pp} puts ONLY the pipeline axis in manual mode; dp/tp stay
    # compiler-managed (GSPMD auto) inside the body.
    return jax.shard_map(
        partial(pipeline_spmd, block_fn, axis=pp_axis, remat=remat),
        mesh=mesh,
        in_specs=(P(pp_axis), P()),
        out_specs=P(),
        axis_names=frozenset({pp_axis}),
        check_vma=False,
    )
