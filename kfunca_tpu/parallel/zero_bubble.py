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

This module also provides **ZB-V** (`zbv_schedule` / `make_zbv_train_step`):
two model chunks per device in a V pattern.  Its greedy schedule realizes
busy fractions of 6M/(6M + S - 1) — only S-1 idle ticks total, vs ZB-H1's
~3(S-1) — and balances in-flight activation memory across devices
(measured: n=8 m=8 busy 0.873 vs H1's 0.774; audit + parity tests in
tests/test_parallel.py::TestZBVPipeline).
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


# ---------------------------------------------------------------------------
# ZB-V: two model chunks per device in a V pattern (round 3)
# ---------------------------------------------------------------------------
#
# Each device hosts TWO chunks of the 2N-stage model: device d runs stage d
# (chunk 0) and stage 2N-1-d (chunk 1).  A microbatch flows DOWN the mesh
# through chunk 0 (device 0 -> N-1), transitions chunks ON device N-1 (no
# hop), flows back UP through chunk 1 (N-1 -> 0), and the loss lands on
# device 0 — the "V".  Backward retraces it: B1 hops 0 -> N-1, transitions
# on N-1, B0 hops N-1 -> 0.  What the V buys over ZB-H1:
#
#   * device 0 owns both the FIRST and LAST stages, so the loss is computed
#     where the input lives and the warmup/cool-down bubbles shrink to the
#     distance of HALF the mesh;
#   * in-flight activation memory is BALANCED: chunk-0 lifetime falls with
#     d while chunk-1 lifetime grows with d, so every device holds ~2N
#     microbatch activations (the 1F1B bound) instead of ZB-H1's N-d skew.
#
# The schedule is greedy (B1/B0 critical path > F1/F0 bounded by per-chunk
# in-flight caps > deferred W fills bubbles), audited by
# validate_zbv_schedule, and realized by ONE lax.scan whose tick hops four
# ring streams (act0/grad1 downward, act1/grad0 upward) and switches over
# {F0, F1, B1, B0, W1, W0, idle}.

ZV_IDLE, ZV_F0, ZV_F1, ZV_B1, ZV_B0, ZV_W1, ZV_W0 = 0, 1, 2, 3, 4, 5, 6


def zbv_schedule(n_stages: int, n_micro: int) -> np.ndarray:
    """Greedy ZB-V list schedule -> (n_stages, T) int32 op table."""
    n, m = n_stages, n_micro
    done = {k: [[-1] * m for _ in range(n)] for k in "f0 f1 b1 b0".split()}
    cnt = {k: [0] * n for k in "f0 f1 b1 b0 w1 w0".split()}
    cols: list[list[int]] = []
    t = 0
    while not all(cnt["w0"][d] == m and cnt["w1"][d] == m for d in range(n)):
        assert t < 8 * (m + n) * n + 64, "zbv schedule failed to converge"
        col = []
        for d in range(n):
            i_f0, i_f1 = cnt["f0"][d], cnt["f1"][d]
            i_b1, i_b0 = cnt["b1"][d], cnt["b0"][d]
            i_w1, i_w0 = cnt["w1"][d], cnt["w0"][d]
            # in-flight caps keep per-device activation memory ~2N while
            # letting the long-lived chunk (0 near the top, 1 near the
            # bottom) run far enough ahead to hide the V's round trip
            cap0 = min(m, 2 * n - 1 - d)
            cap1 = min(m, d + 2)
            b1_ok = (i_b1 < m and 0 <= done["f1"][d][i_b1] < t
                     and (d == 0 or 0 <= done["b1"][d - 1][i_b1] < t))
            b0_ok = (i_b0 < m and 0 <= done["f0"][d][i_b0] < t
                     and (0 <= (done["b1"][d][i_b0] if d == n - 1
                                else done["b0"][d + 1][i_b0]) < t))
            f1_ok = (i_f1 < m and (i_f1 - i_b1) < cap1
                     and (0 <= (done["f0"][d][i_f1] if d == n - 1
                                else done["f1"][d + 1][i_f1]) < t))
            f0_ok = (i_f0 < m and (i_f0 - i_b0) < cap0
                     and (d == 0 or 0 <= done["f0"][d - 1][i_f0] < t))
            if b1_ok:
                op = ZV_B1
                done["b1"][d][i_b1] = t
                cnt["b1"][d] += 1
            elif b0_ok:
                op = ZV_B0
                done["b0"][d][i_b0] = t
                cnt["b0"][d] += 1
            elif f1_ok:
                op = ZV_F1
                done["f1"][d][i_f1] = t
                cnt["f1"][d] += 1
            elif f0_ok:
                op = ZV_F0
                done["f0"][d][i_f0] = t
                cnt["f0"][d] += 1
            elif i_w1 < m and 0 <= done["b1"][d][i_w1] < t:
                op = ZV_W1
                cnt["w1"][d] += 1
            elif i_w0 < m and 0 <= done["b0"][d][i_w0] < t:
                op = ZV_W0
                cnt["w0"][d] += 1
            else:
                op = ZV_IDLE
            col.append(op)
        cols.append(col)
        t += 1
    return np.asarray(cols, np.int32).T


def validate_zbv_schedule(sched: np.ndarray, n_micro: int) -> None:
    """Host-side dependency audit of a ZB-V op table (raises AssertionError)."""
    n, T = sched.shape
    m = n_micro
    done = {k: np.full((n, m), -1) for k in ("f0", "f1", "b1", "b0")}
    cnt = np.zeros((n, 6), int)
    kinds = {ZV_F0: 0, ZV_F1: 1, ZV_B1: 2, ZV_B0: 3, ZV_W1: 4, ZV_W0: 5}
    for t in range(T):
        for d in range(n):
            op = sched[d, t]
            if op == ZV_IDLE:
                continue
            k = kinds[op]
            i = cnt[d, k]
            assert i < m, (d, t, op, "too many ops")
            if op == ZV_F0:
                if d > 0:
                    assert 0 <= done["f0"][d - 1, i] < t, (d, t, i, "F0 needs up F0")
                done["f0"][d, i] = t
            elif op == ZV_F1:
                prev = done["f0"][d, i] if d == n - 1 else done["f1"][d + 1, i]
                assert 0 <= prev < t, (d, t, i, "F1 needs F0@last / down F1")
                done["f1"][d, i] = t
            elif op == ZV_B1:
                assert 0 <= done["f1"][d, i] < t, (d, t, i, "B1 needs local F1")
                if d > 0:
                    assert 0 <= done["b1"][d - 1, i] < t, (d, t, i, "B1 needs up B1")
                done["b1"][d, i] = t
            elif op == ZV_B0:
                assert 0 <= done["f0"][d, i] < t, (d, t, i, "B0 needs local F0")
                prev = done["b1"][d, i] if d == n - 1 else done["b0"][d + 1, i]
                assert 0 <= prev < t, (d, t, i, "B0 needs B1@last / down B0")
                done["b0"][d, i] = t
            elif op == ZV_W1:
                assert 0 <= done["b1"][d, i] < t, (d, t, i, "W1 needs local B1")
            else:
                assert 0 <= done["b0"][d, i] < t, (d, t, i, "W0 needs local B0")
            cnt[d, k] += 1
    assert (cnt == m).all(), f"incomplete zbv schedule: {cnt.tolist()}"


def zbv_schedule_cost(n_stages: int, n_micro: int) -> dict:
    """Realized tick counts: 6 ops per (device, microbatch); busy_frac is
    the zero-bubble figure of merit (1.0 = no idle ticks)."""
    T = zbv_schedule(n_stages, n_micro).shape[1]
    return {"zbv_ticks": int(T), "min_ticks": 6 * n_micro,
            "zbv_busy_frac": 6 * n_micro / T}


def stack_stages_v(block_params: list, n_stages: int):
    """Stack 2*n_stages stage-param pytrees into the ZB-V (n_stages, 2, ...)
    layout: device d's chunk 0 = stage d, chunk 1 = stage 2*n_stages-1-d.
    Axis 0 is sharded over pp."""
    assert len(block_params) == 2 * n_stages, (len(block_params), n_stages)
    rows = [
        jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b]),
            block_params[d], block_params[2 * n_stages - 1 - d],
        )
        for d in range(n_stages)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rows)


def _zbv_spmd(stage_fn, loss_fn, n_stages, op_cols, masks_cols,
              stacked_params, x_mb, *, axis):
    """ZB-V runtime inside shard_map over `axis`.

    stacked_params leaves carry a local (1, 2, ...) leading block: [0, 0] is
    this device's chunk-0 (stage d) params, [0, 1] chunk-1 (stage 2N-1-d).
    masks_cols: (T, 4, n) bool arrival tables for act0/act1/grad1/grad0.
    """
    n = n_stages
    idx = jax.lax.axis_index(axis)
    m = x_mb.shape[0]
    down_perm = [(i, i + 1) for i in range(n - 1)]  # act0, grad1
    up_perm = [(i + 1, i) for i in range(n - 1)]    # act1, grad0

    theta0 = jax.tree_util.tree_map(lambda p: p[0, 0], stacked_params)
    theta1 = jax.tree_util.tree_map(lambda p: p[0, 1], stacked_params)
    is_first = idx == 0
    is_last = idx == n - 1

    def f0(x):
        return stage_fn(theta0, x)

    def f1(x):
        return stage_fn(theta1, x)

    def tick(carry, cols):
        (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
         s_act0, s_act1, s_grad1, s_grad0, loss_acc, cnts, rxs) = carry
        op_row, mask_rows = cols
        op = jnp.take(op_row, idx)
        a0_arr, a1_arr, g1_arr, g0_arr = (jnp.take(mask_rows[k], idx)
                                          for k in range(4))

        r_act0 = jax.lax.ppermute(s_act0, axis, down_perm)
        r_act1 = jax.lax.ppermute(s_act1, axis, up_perm)
        r_grad1 = jax.lax.ppermute(s_grad1, axis, down_perm)
        r_grad0 = jax.lax.ppermute(s_grad0, axis, up_perm)

        a0_rx, a1_rx, g1_rx, g0_rx = rxs

        def buf_write(buf, val, pos, arrives):
            return jnp.where(
                arrives, jax.lax.dynamic_update_index_in_dim(buf, val, pos, 0), buf
            )

        x0_buf = buf_write(x0_buf, r_act0, a0_rx, a0_arr)
        x1_buf = buf_write(x1_buf, r_act1, a1_rx, a1_arr)
        dy1_buf = buf_write(dy1_buf, r_grad1, g1_rx, g1_arr)
        dy0_buf = buf_write(dy0_buf, r_grad0, g0_rx, g0_arr)
        rxs = (a0_rx + a0_arr.astype(jnp.int32),
               a1_rx + a1_arr.astype(jnp.int32),
               g1_rx + g1_arr.astype(jnp.int32),
               g0_rx + g0_arr.astype(jnp.int32))

        state = (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
                 s_act0, s_act1, s_grad1, s_grad0, loss_acc, cnts)

        def take(buf, i):
            return jax.lax.dynamic_index_in_dim(buf, i, 0, keepdims=False)

        def do_idle(s):
            return s

        def do_f0(s):
            (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
             s_act0, s_act1, s_grad1, s_grad0, loss_acc, cnts) = s
            i = cnts[0]
            y = f0(take(x0_buf, i))
            # chunk transition happens ON device N-1: its F0 output is its
            # own chunk-1 input (never rides the ring)
            x1_buf = jnp.where(
                is_last, jax.lax.dynamic_update_index_in_dim(x1_buf, y, i, 0),
                x1_buf)
            return (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
                    y, s_act1, s_grad1, s_grad0, loss_acc,
                    (i + 1,) + cnts[1:])

        def do_f1(s):
            (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
             s_act0, s_act1, s_grad1, s_grad0, loss_acc, cnts) = s
            i = cnts[1]
            y = f1(take(x1_buf, i))
            # device 0's F1 output feeds the loss, recomputed inside B1
            return (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
                    s_act0, y, s_grad1, s_grad0, loss_acc,
                    cnts[:1] + (i + 1,) + cnts[2:])

        def do_b1(s):
            (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
             s_act0, s_act1, s_grad1, s_grad0, loss_acc, cnts) = s
            i = cnts[2]
            x = take(x1_buf, i)
            y, pullback = jax.vjp(f1, x)

            def first_dev():
                ll, dy = jax.value_and_grad(
                    lambda yy: loss_fn(yy, i).astype(jnp.float32))(y)
                return ll, dy

            def mid_dev():
                return jnp.float32(0.0), take(dy1_buf, i)

            ll, dy = jax.lax.cond(is_first, first_dev, mid_dev)
            dx = pullback(dy)[0]
            dy1_buf = jax.lax.dynamic_update_index_in_dim(dy1_buf, dy, i, 0)
            # on device N-1, B1's dx is B0's incoming gradient (local)
            dy0_buf = jnp.where(
                is_last, jax.lax.dynamic_update_index_in_dim(dy0_buf, dx, i, 0),
                dy0_buf)
            return (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
                    s_act0, s_act1, dx, s_grad0, loss_acc + ll,
                    cnts[:2] + (i + 1,) + cnts[3:])

        def do_b0(s):
            (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
             s_act0, s_act1, s_grad1, s_grad0, loss_acc, cnts) = s
            i = cnts[3]
            x = take(x0_buf, i)
            _, pullback = jax.vjp(f0, x)
            dx = pullback(take(dy0_buf, i))[0]
            return (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
                    s_act0, s_act1, s_grad1, dx, loss_acc,
                    cnts[:3] + (i + 1,) + cnts[4:])

        def do_w1(s):
            (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
             s_act0, s_act1, s_grad1, s_grad0, loss_acc, cnts) = s
            i = cnts[4]
            x = take(x1_buf, i)
            _, pullback = jax.vjp(lambda th: stage_fn(th, x), theta1)
            dth = pullback(take(dy1_buf, i))[0]
            dw1 = jax.tree_util.tree_map(jnp.add, dw1, dth)
            return (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
                    s_act0, s_act1, s_grad1, s_grad0, loss_acc,
                    cnts[:4] + (i + 1,) + cnts[5:])

        def do_w0(s):
            (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
             s_act0, s_act1, s_grad1, s_grad0, loss_acc, cnts) = s
            i = cnts[5]
            x = take(x0_buf, i)
            _, pullback = jax.vjp(lambda th: stage_fn(th, x), theta0)
            dth = pullback(take(dy0_buf, i))[0]
            dw0 = jax.tree_util.tree_map(jnp.add, dw0, dth)
            return (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
                    s_act0, s_act1, s_grad1, s_grad0, loss_acc,
                    cnts[:5] + (i + 1,))

        state = jax.lax.switch(
            op, [do_idle, do_f0, do_f1, do_b1, do_b0, do_w1, do_w0], state)
        (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
         s_act0, s_act1, s_grad1, s_grad0, loss_acc, cnts) = state
        return (x0_buf, x1_buf, dy1_buf, dy0_buf, dw0, dw1,
                s_act0, s_act1, s_grad1, s_grad0, loss_acc, cnts, rxs), None

    mb_shape = x_mb.shape[1:]
    zero_mb = jnp.zeros(mb_shape, x_mb.dtype)
    x0_buf0 = jnp.where(is_first, x_mb, jnp.zeros_like(x_mb))
    zeros_like_theta = partial(jax.tree_util.tree_map,
                               lambda p: jnp.zeros_like(p, jnp.float32))
    init = (
        x0_buf0,
        jnp.zeros((m,) + mb_shape, x_mb.dtype),
        jnp.zeros((m,) + mb_shape, x_mb.dtype),
        jnp.zeros((m,) + mb_shape, x_mb.dtype),
        zeros_like_theta(theta0),
        zeros_like_theta(theta1),
        zero_mb, zero_mb, zero_mb, zero_mb,
        jnp.float32(0.0),
        tuple(jnp.int32(0) for _ in range(6)),
        tuple(jnp.int32(0) for _ in range(4)),
    )
    carry, _ = jax.lax.scan(tick, init, (op_cols, masks_cols))
    dw0, dw1, loss_acc = carry[4], carry[5], carry[10]
    loss = jax.lax.psum(loss_acc, axis)
    dw_out = jax.tree_util.tree_map(
        lambda g0, g1, p: jnp.stack([g0.astype(p.dtype), g1.astype(p.dtype)])[None],
        dw0, dw1, jax.tree_util.tree_map(lambda p: p[0, 0], stacked_params),
    )
    return loss, dw_out


def make_zbv_train_step(stage_fn, loss_fn, mesh, *, pp_axis: str = "pp",
                        n_micro: int | None = None):
    """Build a ZB-V pipelined loss+grad step:

        fn(stacked_params, x_microbatches) -> (total_loss, stage_grads)

    stacked_params: pytree with leading (n_stages, 2, ...) axes (see
    `stack_stages_v`: device d = stages d and 2*n_stages-1-d), sharded over
    `pp_axis`.  x_microbatches: (M, mb, ...) replicated; device 0 consumes
    AND produces the loss (the V's endpoints both live there).  Gradients
    are sums over microbatches, shaped/sharded like stacked_params.
    """
    n_stages = mesh.shape[pp_axis]
    if n_micro is None:
        raise ValueError("pass n_micro (the leading axis of x_microbatches)")
    sched = zbv_schedule(n_stages, n_micro)
    validate_zbv_schedule(sched, n_micro)
    n, T = sched.shape
    # arrival tables, one per ring stream (see _zbv_spmd docstring)
    masks = np.zeros((4, n, T), bool)
    masks[0, 1:, 1:] = sched[:-1, :-1] == ZV_F0   # act0 from d-1
    masks[1, :-1, 1:] = sched[1:, :-1] == ZV_F1   # act1 from d+1
    masks[2, 1:, 1:] = sched[:-1, :-1] == ZV_B1   # grad1 from d-1
    masks[3, :-1, 1:] = sched[1:, :-1] == ZV_B0   # grad0 from d+1
    op_cols = np.ascontiguousarray(sched.T)             # (T, n)
    masks_cols = np.ascontiguousarray(masks.transpose(2, 0, 1))  # (T, 4, n)

    return jax.shard_map(
        partial(_zbv_spmd, stage_fn, loss_fn, n_stages, op_cols, masks_cols,
                axis=pp_axis),
        mesh=mesh,
        in_specs=(P(pp_axis), P()),
        out_specs=(P(), P(pp_axis)),
        axis_names=frozenset({pp_axis}),
        check_vma=False,
    )


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
