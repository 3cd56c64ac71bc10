"""Zero-bubble pipeline schedule (ZB-H1 style): hand-scheduled F/B/W ticks.

Green-field capability (the reference `/root/reference` is single-device;
no analog).  The GPipe/interleaved pipelines in `pipeline.py` get their
backward schedule from the AD transpose of a `lax.scan` — correct, but the
backward inherits the forward's bubble: 2*(S-1) full-stage ticks idle per
pass.  The zero-bubble family (Qi et al., "Zero Bubble Pipeline
Parallelism") splits each stage backward into

  * **B** — the input gradient dx (the only part downstream stages wait
    for: it rides the critical path), and
  * **W** — the weight gradient dW (no inter-stage consumer: it can be
    deferred into what would otherwise be bubble ticks),

and list-schedules {F, B, W} per device so cool-down bubbles are filled
with deferred W work.

TPU-native realization: ONE SPMD program under `shard_map` over the `pp`
mesh axis.  The schedule is a host-precomputed (n_stages, T) op table; the
runtime is a single `lax.scan` over ticks whose body

  1. hops activations stage->stage and gradients stage<-stage with
     neighbor `ppermute`s (ICI transfers, non-cyclic rings),
  2. buffers arrivals into per-microbatch VMEM/HBM-resident buffers
     (arrival masks are derived from the op table, so stale ring payloads
     are ignored),
  3. dispatches this tick's op via a 4-way `lax.switch` on the device's
     table entry — F, B, W, or idle.

B and W are built from `jax.vjp` of the stage with the OTHER argument's
cotangent discarded: XLA dead-code-eliminates the untaken half, so B
compiles to forward-recompute + dx and W to forward-recompute + dW.  Both
therefore re-run the stage forward (activation-memory policy identical to
`remat=True` on the scan pipelines).  Honest cost accounting, in stage
forward units (1 fwd ~= 1 matmul set, dx ~= 1, dW ~= 1):

    GPipe + remat (pipeline.py): per-device wall ~ 4*(M + S - 1) units
        (fwd tick = 1 unit, bwd tick = recompute+dx+dW = 3)
    ZB-H1 here:                  per-device busy work = 5M units
        (F = 1, B = recompute+dx = 2, W = recompute+dW = 2) + a small
        residual bubble

so under this unit model the schedule wins when M is smaller than
roughly 4*(S-1); at large M the extra forward recompute dominates and
the scan pipeline is preferable.  `schedule_cost` exposes the realized
tick counts so callers can compare schedules for their (S, M).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

IDLE, OP_F, OP_B, OP_W = 0, 1, 2, 3


def zb_schedule(n_stages: int, n_micro: int) -> np.ndarray:
    """Greedy ZB-H1-style list schedule -> (n_stages, T) int32 op table.

    Per device, per tick, pick the first available of:
      B (critical path) > F (bounded by the 1F1B in-flight cap n-d) > W.
    Availability honors the one-tick ppermute latency: an op's producers
    must have run on a STRICTLY earlier tick.
    """
    n, m = n_stages, n_micro
    done_f = [[-1] * m for _ in range(n)]
    done_b = [[-1] * m for _ in range(n)]
    f_cnt = [0] * n
    b_cnt = [0] * n
    w_cnt = [0] * n
    cols: list[list[int]] = []
    t = 0
    while not all(c == m for c in w_cnt):
        assert t < 4 * (m + n) * n + 64, "schedule failed to converge"
        col = []
        for d in range(n):
            op = IDLE
            ib, if_, iw = b_cnt[d], f_cnt[d], w_cnt[d]
            b_ok = (
                ib < m
                and 0 <= done_f[d][ib] < t
                and (d == n - 1 or 0 <= done_b[d + 1][ib] < t)
            )
            f_ok = (
                if_ < m
                and (d == 0 or 0 <= done_f[d - 1][if_] < t)
                and (if_ - ib) < (n - d)
            )
            w_ok = iw < m and 0 <= done_b[d][iw] < t
            if b_ok:
                op = OP_B
                done_b[d][ib] = t
                b_cnt[d] += 1
            elif f_ok:
                op = OP_F
                done_f[d][if_] = t
                f_cnt[d] += 1
            elif w_ok:
                op = OP_W
                w_cnt[d] += 1
            col.append(op)
        cols.append(col)
        t += 1
    return np.asarray(cols, np.int32).T  # (n, T)


def validate_schedule(sched: np.ndarray, n_micro: int) -> None:
    """Host-side dependency audit of an op table (raises AssertionError).

    Checks, per device: ops of each kind run in microbatch order and the
    right number of times; F_i on d needs F_i on d-1 strictly earlier;
    B_i needs local F_i and downstream B_i strictly earlier; W_i needs
    local B_i strictly earlier."""
    n, T = sched.shape
    m = n_micro
    done_f = np.full((n, m), -1)
    done_b = np.full((n, m), -1)
    done_w = np.full((n, m), -1)
    cnt = np.zeros((n, 3), int)
    for t in range(T):
        for d in range(n):
            op = sched[d, t]
            if op == IDLE:
                continue
            kind = {OP_F: 0, OP_B: 1, OP_W: 2}[op]
            i = cnt[d, kind]
            assert i < m, f"device {d} ran too many ops of kind {op}"
            if op == OP_F:
                if d > 0:
                    assert 0 <= done_f[d - 1, i] < t, (d, t, i, "F needs upstream F")
                done_f[d, i] = t
            elif op == OP_B:
                assert 0 <= done_f[d, i] < t, (d, t, i, "B needs local F")
                if d < n - 1:
                    assert 0 <= done_b[d + 1, i] < t, (d, t, i, "B needs downstream B")
                done_b[d, i] = t
            else:
                assert 0 <= done_b[d, i] < t, (d, t, i, "W needs local B")
                done_w[d, i] = t
            cnt[d, kind] += 1
    assert (cnt == m).all(), f"incomplete schedule: {cnt.tolist()}"


def schedule_cost(n_stages: int, n_micro: int) -> dict:
    """Analytic tick counts: ZB-H1 table vs the scan pipeline's fwd+bwd.

    Units are TICKS of the respective schedule (a ZB tick is one of
    F/B/W ~ 1-2 fwd units; a scan-pipeline backward tick is ~3)."""
    T = zb_schedule(n_stages, n_micro).shape[1]
    scan_ticks = 2 * (n_micro + n_stages - 1)  # fwd scan + its AD transpose
    return {"zb_ticks": int(T), "scan_ticks": scan_ticks,
            "zb_busy_frac": 3 * n_micro / T}


def _zb_spmd(stage_fn, loss_fn, n_stages, op_cols, act_cols, grad_cols,
             stacked_params, x_mb, *, axis):
    """Runs INSIDE shard_map over `axis`.

    stage_fn(stage_params, x) applies one device's whole stage.
    loss_fn(y, i) -> scalar loss of final-stage output y for microbatch i.
    op/act/grad_cols: (T, n) host tables (op per tick; arrival masks).
    Returns (total_loss, stage param grads with the local leading-1 axis).
    """
    n = n_stages
    idx = jax.lax.axis_index(axis)
    m = x_mb.shape[0]
    fwd_perm = [(i, i + 1) for i in range(n - 1)]
    bwd_perm = [(i + 1, i) for i in range(n - 1)]

    theta = jax.tree_util.tree_map(lambda p: p[0], stacked_params)

    def f_x(x):
        return stage_fn(theta, x)

    is_last = idx == n - 1

    def tick(carry, cols):
        (x_buf, dy_buf, dw, send_act, send_grad, loss_acc,
         f_cnt, b_cnt, w_cnt, act_rx, grad_rx) = carry
        op_row, act_row, grad_row = cols
        op = jnp.take(op_row, idx)
        act_arrives = jnp.take(act_row, idx)
        grad_arrives = jnp.take(grad_row, idx)

        # hop both streams every tick; arrival masks (from the static
        # schedule) decide whether the payload is real or stale
        recv_act = jax.lax.ppermute(send_act, axis, fwd_perm)
        recv_grad = jax.lax.ppermute(send_grad, axis, bwd_perm)
        x_buf = jnp.where(
            act_arrives,
            jax.lax.dynamic_update_index_in_dim(x_buf, recv_act, act_rx, 0),
            x_buf,
        )
        act_rx = act_rx + act_arrives.astype(jnp.int32)
        dy_buf = jnp.where(
            grad_arrives,
            jax.lax.dynamic_update_index_in_dim(dy_buf, recv_grad, grad_rx, 0),
            dy_buf,
        )
        grad_rx = grad_rx + grad_arrives.astype(jnp.int32)

        state = (x_buf, dy_buf, dw, send_act, send_grad, loss_acc,
                 f_cnt, b_cnt, w_cnt)

        def do_idle(s):
            return s

        def do_f(s):
            (x_buf, dy_buf, dw, send_act, send_grad, loss_acc,
             f_cnt, b_cnt, w_cnt) = s
            x = jax.lax.dynamic_index_in_dim(x_buf, f_cnt, 0, keepdims=False)
            y = f_x(x)
            return (x_buf, dy_buf, dw, y, send_grad, loss_acc,
                    f_cnt + 1, b_cnt, w_cnt)

        def do_b(s):
            (x_buf, dy_buf, dw, send_act, send_grad, loss_acc,
             f_cnt, b_cnt, w_cnt) = s
            x = jax.lax.dynamic_index_in_dim(x_buf, b_cnt, 0, keepdims=False)
            # vjp w.r.t. x ONLY: XLA prunes the dW half of the transpose
            y, pullback = jax.vjp(f_x, x)

            def last_stage():
                ll, dy = jax.value_and_grad(
                    lambda yy: loss_fn(yy, b_cnt).astype(jnp.float32)
                )(y)
                return ll, dy

            def mid_stage():
                dy = jax.lax.dynamic_index_in_dim(dy_buf, b_cnt, 0, keepdims=False)
                return jnp.float32(0.0), dy

            ll, dy = jax.lax.cond(is_last, last_stage, mid_stage)
            dx = pullback(dy)[0]
            # save dy for the deferred W op
            dy_buf = jax.lax.dynamic_update_index_in_dim(dy_buf, dy, b_cnt, 0)
            return (x_buf, dy_buf, dw, send_act, dx, loss_acc + ll,
                    f_cnt, b_cnt + 1, w_cnt)

        def do_w(s):
            (x_buf, dy_buf, dw, send_act, send_grad, loss_acc,
             f_cnt, b_cnt, w_cnt) = s
            x = jax.lax.dynamic_index_in_dim(x_buf, w_cnt, 0, keepdims=False)
            dy = jax.lax.dynamic_index_in_dim(dy_buf, w_cnt, 0, keepdims=False)
            # vjp w.r.t. theta ONLY: the dx half is pruned
            _, pullback = jax.vjp(lambda th: stage_fn(th, x), theta)
            dth = pullback(dy)[0]
            dw = jax.tree_util.tree_map(jnp.add, dw, dth)
            return (x_buf, dy_buf, dw, send_act, send_grad, loss_acc,
                    f_cnt, b_cnt, w_cnt + 1)

        state = jax.lax.switch(op, [do_idle, do_f, do_b, do_w], state)
        (x_buf, dy_buf, dw, send_act, send_grad, loss_acc,
         f_cnt, b_cnt, w_cnt) = state
        return (x_buf, dy_buf, dw, send_act, send_grad, loss_acc,
                f_cnt, b_cnt, w_cnt, act_rx, grad_rx), None

    mb_shape = x_mb.shape[1:]
    # device 0 feeds from the caller's microbatches; every other device's
    # x_buf fills from ring arrivals
    x_buf0 = jnp.where(idx == 0, x_mb, jnp.zeros_like(x_mb))
    init = (
        x_buf0,
        jnp.zeros((m,) + mb_shape, x_mb.dtype),
        jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), theta),
        jnp.zeros(mb_shape, x_mb.dtype),
        jnp.zeros(mb_shape, x_mb.dtype),
        jnp.float32(0.0),
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )
    carry, _ = jax.lax.scan(tick, init, (op_cols, act_cols, grad_cols))
    dw, loss_acc = carry[2], carry[5]
    # loss lives on the last stage only (gated in do_b); f32 psum (XLA:CPU
    # crashes promoting bf16 all-reduce) broadcasts it everywhere
    loss = jax.lax.psum(loss_acc, axis)
    dw_out = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype)[None], dw,
        jax.tree_util.tree_map(lambda p: p[0], stacked_params),
    )
    return loss, dw_out


def make_zb_train_step(stage_fn, loss_fn, mesh, *, pp_axis: str = "pp",
                       n_micro: int | None = None):
    """Build a zero-bubble pipelined loss+grad step:

        fn(stacked_params, x_microbatches) -> (total_loss, stage_grads)

    stacked_params: pytree with leading (n_stages, ...) axes (see
    `pipeline.stack_stages`), sharded over `pp_axis`.
    x_microbatches: (M, mb, ...) inputs (replicated; stage 0 consumes).
    loss_fn(y, i): scalar loss of last-stage output y for microbatch i
    (close over targets).  Gradients are SUMS over microbatches — divide
    by M for a mean-loss convention.  stage_grads leading axis is sharded
    over `pp_axis` like the params.
    """
    n_stages = mesh.shape[pp_axis]
    if n_micro is None:
        raise ValueError("pass n_micro (the leading axis of x_microbatches)")
    sched = zb_schedule(n_stages, n_micro)
    validate_schedule(sched, n_micro)
    n, T = sched.shape
    # arrival masks: a real activation lands on d at t iff d-1 ran F at t-1;
    # a real gradient lands on d at t iff d+1 ran B at t-1
    act_arr = np.zeros((n, T), bool)
    grad_arr = np.zeros((n, T), bool)
    act_arr[1:, 1:] = sched[:-1, :-1] == OP_F
    grad_arr[:-1, 1:] = sched[1:, :-1] == OP_B
    # numpy constants: baked into the traced program (replicated), not
    # shard_map operands
    op_cols = np.ascontiguousarray(sched.T)  # (T, n)
    act_cols = np.ascontiguousarray(act_arr.T)
    grad_cols = np.ascontiguousarray(grad_arr.T)

    return jax.shard_map(
        partial(_zb_spmd, stage_fn, loss_fn, n_stages,
                op_cols, act_cols, grad_cols, axis=pp_axis),
        mesh=mesh,
        in_specs=(P(pp_axis), P()),
        out_specs=(P(), P(pp_axis)),
        axis_names=frozenset({pp_axis}),
        check_vma=False,
    )
