"""Pallas TPU kernel for the Mamba selective scan (fwd + bwd).

Why a kernel: XLA lowers `lax.associative_scan` to a log-depth tree whose
(B, L, d_inner, N) intermediates round-trip HBM at every level — measured
11-14 ms fwd / 36 ms fwd+bwd per layer at (B4 L1024 di1024 N16) on v5e
against an HBM floor of ~0.05 ms.  This kernel measures 0.1-1 ms fwd and
1.75 ms fwd+bwd on the same shape (tools_ssm_isolate.py) — ~20x — and
lifts the full Mamba train step 8.1x end-to-end (21.4 vs 174 ms/step,
191k vs 23.5k tok/s at d512 L1024 B4, interleaved 3 rounds; at d768
L2048 — where the naive XLA scan cannot even compile — 55 ms/step =
149k tok/s vs 618 ms for the chunked XLA form, 11.2x; grads match
the XLA path to ~1e-7 relative on the real chip).  The kernel
keeps the whole recurrence in VMEM: per (batch, di-tile) it walks the
sequence in L-blocks, runs the log-depth combine on the block INSIDE
VMEM, carries the (N, di_blk) boundary state in scratch, and touches HBM
only for the (B, L, di) inputs/outputs — the same flashification recipe
as the attention kernels.

Layout: state lives as (N, di_blk) — di on the 128-wide lane axis (fully
utilized), the tiny N=16 state dim on sublanes.  A is pre-transposed to
(N, di) host-side.

Forward also emits the per-block boundary states h_bound (B, nblk, N, di)
— tiny (L/L_blk times smaller than the full h) — which the backward
consumes to recompute each block's states in VMEM while running the
REVERSE recurrence

    delta_{t} = dA_{t+1} * delta_{t+1} + C_t (x) dy_t

as the same in-VMEM block scan over a reversed grid (index_map l ->
nblk-1-l), producing du/ddt/dB/dC exactly and accumulating dA_param/dD
in scratch across the sequence.

Contract (matches models/mamba.ssm_apply): u = dt * hidden,
dA = exp(dt*A), h_t = dA_t h_{t-1} + u_t B_t, y_t = C_t . h_t + D*u...
(the D*u readout term and the u = dt*hidden product are kept OUTSIDE the
kernel so the kernel's surface is the pure recurrence; models/mamba.py
composes them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I0 = _np.int32(0)  # index-map constants must be i32 (x64 is on)


def _combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, a2 * b1 + b2


def _ks_scan(a, b, reverse=False):
    """Inclusive Kogge-Stone scan of the (a, b) recurrence pairs over
    axis 0 (length must be a power of two).  Mosaic-friendly: every step
    is a full-width elementwise combine with a STATIC positive-size
    shift (identity padding (1, 0) makes the out-of-range lanes no-ops),
    unlike lax.associative_scan whose odd-size recursion emits zero-width
    slices Mosaic cannot lower.  reverse=True computes the suffix
    composition (f_t o f_{t+1} o ...), the backward pass's recurrence."""
    L = a.shape[0]
    d = 1
    while d < L:
        if not reverse:
            a_s = jnp.concatenate([jnp.ones_like(a[:d]), a[:-d]], axis=0)
            b_s = jnp.concatenate([jnp.zeros_like(b[:d]), b[:-d]], axis=0)
        else:
            a_s = jnp.concatenate([a[d:], jnp.ones_like(a[:d])], axis=0)
            b_s = jnp.concatenate([b[d:], jnp.zeros_like(b[:d])], axis=0)
        a, b = _combine((a_s, b_s), (a, b))
        d *= 2
    return a, b


def _fwd_kernel(dt_ref, u_ref, b_ref, c_ref, at_ref, y_ref, hb_ref, h_acc,
                *, lb):
    il = pl.program_id(2)

    @pl.when(il == 0)
    def _init():
        h_acc[:] = jnp.zeros_like(h_acc)

    dt = dt_ref[0].astype(jnp.float32)  # (lb, dib)
    u = u_ref[0].astype(jnp.float32)  # (lb, dib)
    bm = b_ref[0].astype(jnp.float32)  # (lb, N)
    c = c_ref[0].astype(jnp.float32)  # (lb, N)
    at = at_ref[:].astype(jnp.float32)  # (N, dib)

    dA = jnp.exp(dt[:, None, :] * at[None])  # (lb, N, dib) in VMEM
    dBu = u[:, None, :] * bm[..., None]
    a_cum, b_cum = _ks_scan(dA, dBu)
    h = a_cum * h_acc[:][None] + b_cum  # (lb, N, dib)
    y_ref[0] = jnp.sum(h * c[..., None], axis=1).astype(y_ref.dtype)
    hb_ref[0, 0] = h_acc[:].astype(hb_ref.dtype)  # state ENTERING the block
    h_acc[:] = h[lb - 1]  # static index (-1 lowers to dynamic_slice)


@functools.partial(
    jax.jit, static_argnames=("lb", "dib", "interpret"))
def ssm_scan_fwd(dt, u, bm, c, a_t, lb=64, dib=512, interpret=False):
    """dt/u (B, L, di) fp32, bm/c (B, L, N) fp32, a_t (N, di) fp32 ->
    (y (B, L, di) fp32, h_bound (B, L//lb, N, di) fp32).  L % lb == 0,
    di % dib == 0."""
    b, L, di = dt.shape
    n = bm.shape[-1]
    assert L % lb == 0 and di % dib == 0, (L, lb, di, dib)
    nblk = L // lb
    grid = (b, di // dib, nblk)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, lb=lb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, lb, dib), lambda ib, id_, il: (ib, il, id_)),
            pl.BlockSpec((1, lb, dib), lambda ib, id_, il: (ib, il, id_)),
            pl.BlockSpec((1, lb, n), lambda ib, id_, il: (ib, il, _I0)),
            pl.BlockSpec((1, lb, n), lambda ib, id_, il: (ib, il, _I0)),
            pl.BlockSpec((n, dib), lambda ib, id_, il: (_I0, id_)),
        ],
        out_specs=[
            pl.BlockSpec((1, lb, dib), lambda ib, id_, il: (ib, il, id_)),
            pl.BlockSpec((1, 1, n, dib), lambda ib, id_, il: (ib, il, _I0, id_)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, L, di), jnp.float32),
            jax.ShapeDtypeStruct((b, nblk, n, di), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n, dib), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(dt, u, bm, c, a_t)


def _bwd_kernel(dt_ref, u_ref, b_ref, c_ref, at_ref, hb_ref, dy_ref,
                ddt_ref, du_ref, db_ref, dc_ref, dat_ref, d_acc, *, lb):
    il = pl.program_id(2)  # reversed by the index maps

    @pl.when(il == 0)
    def _init():
        d_acc[:] = jnp.zeros_like(d_acc)  # delta carried from the RIGHT
        dat_ref[0] = jnp.zeros_like(dat_ref[0])

    dt = dt_ref[0].astype(jnp.float32)  # (lb, dib)
    u = u_ref[0].astype(jnp.float32)
    bm = b_ref[0].astype(jnp.float32)  # (lb, N)
    c = c_ref[0].astype(jnp.float32)
    at = at_ref[:].astype(jnp.float32)  # (N, dib)
    h0 = hb_ref[0, 0].astype(jnp.float32)  # state entering this block
    dy = dy_ref[0].astype(jnp.float32)  # (lb, dib)

    # recompute this block's forward states in VMEM
    dA = jnp.exp(dt[:, None, :] * at[None])  # (lb, N, dib)
    dBu = u[:, None, :] * bm[..., None]
    a_cum, b_cum = _ks_scan(dA, dBu)
    h = a_cum * h0[None] + b_cum  # (lb, N, dib)
    h_prev = jnp.concatenate([h0[None], h[: lb - 1]], axis=0)

    # reverse recurrence: delta_t = dA_{t+1} delta_{t+1} + C_t dy_t,
    # with delta entering from the right = d_acc.  Shift dA left by one
    # (the coefficient that carries delta_t+1 INTO t), pad last with the
    # carry's coefficient handled via the initial value fold-in.
    src = c[..., None] * dy[:, None, :]  # (lb, N, dib)
    dA_next = jnp.concatenate(
        [dA[1:], jnp.ones_like(dA[:1])], axis=0)  # (lb, N, dib)
    ar_cum, br_cum = _ks_scan(dA_next, src, reverse=True)
    # delta_t = br_cum_t + ar_cum_t * (dA boundary into next block * carry)
    delta = br_cum + ar_cum * d_acc[:][None]

    # parameter/input grads
    ddA = delta * h_prev  # d wrt dA_t
    # dt grad: through dA = exp(dt*A) AND through u = (outside) — the u
    # path is composed in models/mamba.py; here u is an independent input
    ddt_ref[0] = jnp.sum(ddA * dA * at[None], axis=1).astype(ddt_ref.dtype)
    du_ref[0] = jnp.sum(delta * bm[..., None], axis=1).astype(du_ref.dtype)
    # db/dc are PARTIAL over this di-tile (the (b, l) block is revisited
    # by every di-tile; outputs are not accumulated across revisits, so
    # each tile writes its own slot and the wrapper sums axis 1)
    db_ref[0, 0] = jnp.sum(delta * u[:, None, :], axis=2).astype(db_ref.dtype)
    dc_ref[0, 0] = jnp.sum(h * dy[:, None, :], axis=2).astype(dc_ref.dtype)
    # da accumulates over the CONSECUTIVE il run of one (b, di-tile) pair
    # (block stays resident); partial per b, summed by the wrapper
    dat_ref[0] = (dat_ref[0]
                  + jnp.sum(ddA * dA * dt[:, None, :], axis=0
                            ).astype(dat_ref.dtype))
    # delta entering this block from the right of the PREVIOUS (earlier)
    # block = dA_0 * delta_0's upstream: carry = dA[0] * delta[0]
    d_acc[:] = dA[0] * delta[0]


@functools.partial(
    jax.jit, static_argnames=("lb", "dib", "interpret"))
def ssm_scan_bwd(dt, u, bm, c, a_t, h_bound, dy, lb=64, dib=512,
                 interpret=False):
    """Gradients of ssm_scan_fwd's y wrt (dt, u, bm, c, a_t).  Consumes
    the forward's h_bound block-boundary states; runs the grid's L axis
    REVERSED via the index maps."""
    b, L, di = dt.shape
    n = bm.shape[-1]
    assert L % lb == 0 and di % dib == 0, (L, lb, di, dib)
    nblk = L // lb

    nb1 = _np.int32(nblk - 1)

    def rev(ib, id_, il):
        return (ib, nb1 - il, id_)

    def rev_hb(ib, id_, il):
        return (ib, nb1 - il, _I0, id_)

    ddt, du, dbp, dcp, datp = pl.pallas_call(
        functools.partial(_bwd_kernel, lb=lb),
        grid=(b, di // dib, nblk),
        in_specs=[
            pl.BlockSpec((1, lb, dib), rev),
            pl.BlockSpec((1, lb, dib), rev),
            pl.BlockSpec((1, lb, n), lambda ib, id_, il: (ib, nb1 - il, _I0)),
            pl.BlockSpec((1, lb, n), lambda ib, id_, il: (ib, nb1 - il, _I0)),
            pl.BlockSpec((n, dib), lambda ib, id_, il: (_I0, id_)),
            pl.BlockSpec((1, 1, n, dib), rev_hb),
            pl.BlockSpec((1, lb, dib), rev),
        ],
        out_specs=[
            pl.BlockSpec((1, lb, dib), rev),
            pl.BlockSpec((1, lb, dib), rev),
            pl.BlockSpec((1, 1, lb, n),
                         lambda ib, id_, il: (ib, id_, nb1 - il, _I0)),
            pl.BlockSpec((1, 1, lb, n),
                         lambda ib, id_, il: (ib, id_, nb1 - il, _I0)),
            pl.BlockSpec((1, n, dib), lambda ib, id_, il: (ib, _I0, id_)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, L, di), jnp.float32),  # ddt (dA path)
            jax.ShapeDtypeStruct((b, L, di), jnp.float32),  # du
            jax.ShapeDtypeStruct((b, di // dib, L, n), jnp.float32),
            jax.ShapeDtypeStruct((b, di // dib, L, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, di), jnp.float32),  # da_t per b
        ],
        scratch_shapes=[pltpu.VMEM((n, dib), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(dt, u, bm, c, a_t, h_bound, dy)
    return ddt, du, dbp.sum(axis=1), dcp.sum(axis=1), datp.sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ssm_scan(dt, u, bm, c, a_t, lb=64, dib=512):
    """Differentiable y_t = C_t . h_t with h_t = exp(dt_t A) h_{t-1} +
    u_t B_t, both passes as Pallas kernels.  a_t is A TRANSPOSED (N, di).
    Composable: u's dependence on (dt, hidden) and the D*hidden readout
    live in models/mamba.ssm_apply, so the chain rule routes this
    kernel's (ddt, du, ...) onward automatically."""
    y, _ = ssm_scan_fwd(dt, u, bm, c, a_t, lb=lb, dib=dib)
    return y


def _ssm_scan_vjp_fwd(dt, u, bm, c, a_t, lb, dib):
    y, hb = ssm_scan_fwd(dt, u, bm, c, a_t, lb=lb, dib=dib)
    return y, (dt, u, bm, c, a_t, hb)


def _ssm_scan_vjp_bwd(lb, dib, res, dy):
    dt, u, bm, c, a_t, hb = res
    return ssm_scan_bwd(dt, u, bm, c, a_t, hb, dy, lb=lb, dib=dib)


ssm_scan.defvjp(_ssm_scan_vjp_fwd, _ssm_scan_vjp_bwd)
