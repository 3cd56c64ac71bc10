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


# ---------------------------------------------------------------------------
# interleaved schedule (round 3): v virtual stage chunks per device
# ---------------------------------------------------------------------------


def stack_stages_interleaved(block_params: list, n_stages: int, v: int):
    """Stack layers for the INTERLEAVED schedule: virtual stage j (of
    V = v * n_stages) holds layers [j*per : (j+1)*per] and lives on device
    j % n_stages as its chunk j // n_stages.  Leaves get a leading
    (n_stages, v, per) axis; axis 0 is sharded over pp."""
    n_layers = len(block_params)
    V = v * n_stages
    assert n_layers % V == 0, (n_layers, n_stages, v)
    per = n_layers // V
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *block_params)
    return jax.tree_util.tree_map(
        # (V*per, ...) -> (v, n, per, ...) -> (n, v, per, ...)
        lambda x: x.reshape((v, n_stages, per) + x.shape[1:]).swapaxes(0, 1),
        stacked,
    )


def pipeline_interleaved_spmd(
    stage_block_fn, stacked_params, x_mb, *, axis: str = "pp", v: int = 2,
    remat: bool = False
):
    """Interleaved pipeline: each device applies its v chunks every tick, so
    v activation streams ride the same ppermute ring concurrently.  Virtual
    stage j = c*n + d runs on device d as chunk c; the ring edge n-1 -> 0
    also hands an activation from stream c to stream c+1 (the wrap into the
    device's next chunk).  Ticks: M + v*n - 1.

    The per-device per-tick FLOPs equal the GPipe schedule's (v chunks x
    layers/V each); what interleaving buys is a v-times smaller pipeline
    bubble per microbatch in the 1F1B sense — here realized through the AD
    transpose of the scan, same as the non-interleaved schedule.
    """
    n_stages = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    m = x_mb.shape[0]
    V = v * n_stages
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    local = jax.tree_util.tree_map(lambda x: x[0], stacked_params)  # (v, per, ...)

    def apply_chunk(c, x):
        params_c = jax.tree_util.tree_map(
            lambda p: jax.lax.dynamic_index_in_dim(p, c, 0, keepdims=False), local
        )

        def body(h, layer_params):
            return stage_block_fn(layer_params, h), None

        h, _ = jax.lax.scan(body, x, params_c)
        return h

    if remat:
        apply_chunk = jax.checkpoint(apply_chunk)

    def tick(state, t):
        # state: (v, mb, S, D) — one activation per chunk stream
        recv = jax.lax.ppermute(state, axis, perm)
        mbatch = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, m - 1), axis=0, keepdims=False
        )
        feed = jnp.logical_and(idx == 0, t < m)
        ins = [jnp.where(feed, mbatch, recv[0])]
        for c in range(1, v):
            # device 0's chunk c consumes what stream c-1 finished on the
            # last device (the virtual-stage wrap); other devices continue
            # their own stream c
            ins.append(jnp.where(idx == 0, recv[c - 1], recv[c]))
        outs = jnp.stack([apply_chunk(c, ins[c]) for c in range(v)])
        return outs, outs[v - 1]

    init = jnp.zeros((v,) + x_mb.shape[1:], x_mb.dtype)
    _, ys = jax.lax.scan(tick, init, jnp.arange(m + V - 1))
    outs = ys[V - 1 :]  # (M, mb, S, D), valid on the last stage only
    is_last = (idx == n_stages - 1).astype(jnp.float32)
    return jax.lax.psum(outs.astype(jnp.float32) * is_last, axis).astype(outs.dtype)


def make_interleaved_pipeline(block_fn, mesh, *, pp_axis: str = "pp", v: int = 2,
                              remat: bool = False):
    """Interleaved variant of make_pipelined_forward: params stacked with
    stack_stages_interleaved(..., v), v virtual stage chunks per device."""
    return jax.shard_map(
        partial(pipeline_interleaved_spmd, block_fn, axis=pp_axis, v=v, remat=remat),
        mesh=mesh,
        in_specs=(P(pp_axis), P()),
        out_specs=P(),
        axis_names=frozenset({pp_axis}),
        check_vma=False,
    )
