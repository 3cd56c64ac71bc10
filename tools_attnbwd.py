"""Round-3 fused flash-attention BACKWARD experiments (VERDICT task 1).

The round-2 backward runs TWO kernels (dkv + dq), recomputing s and dp in
each: 7 matmul-units per live block pair vs the 5 a fused pass needs.  The
fused kernel here computes dq/dk/dv in ONE pass:

  * grid: (bh, t) over LIVE (ik, iq) pairs only (kv-major, q inner),
    scalar-prefetched step tables — dead blocks never enter the grid;
  * dk/dv accumulate in (bk, dp) VMEM scratch, flushed at each kv row end;
  * dq accumulates in a WHOLE-SEQUENCE (sqp, dp) f32 VMEM scratch (1 MB at
    s=2048, d=128), zeroed at each bh start and flushed once at bh end —
    no HBM read-modify-write of revisited output blocks (whose DMA ordering
    vs pipelined prefetch is undefined), no second pass;
  * exp2 softmax: q pre-scaled by scale*log2(e), lse passed as lse*log2(e);
    dk absorbs ln2 at flush, dq absorbs scale at flush (tile-wide ds is
    scaled exactly once, in the cheap (rows,128) flush multiply);
  * diagonal-only masking (scalar lax.cond), pad mask only when needed.

Run on TPU:  python tools_attnbwd.py bench
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("ATTN3_INTERPRET", "0") == "1"
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

NEG_INF = _np.float32(-1e30)
LOG2E = _np.float32(math.log2(math.e))
LN2 = _np.float32(math.log(2.0))


def _lanes(x128, n):
    if n == 128:
        return x128
    if n < 128:
        return x128[:, :n]
    return jnp.tile(x128, (1, n // 128))


# step-table flags
F_ROW_FIRST = 1  # first live q block of this kv row: zero dk/dv acc
F_ROW_LAST = 2   # last q block of this kv row: flush dk/dv
F_BH_FIRST = 4   # first step for this bh: zero dq acc
F_BH_LAST = 8    # last step for this bh: flush dq


def _bwd_tables(nqb, nkb, bq, bk):
    iqs, iks, fls = [], [], []
    steps = []
    for jk in range(nkb):
        first_q = (jk * bk) // bq
        for i in range(first_q, nqb):
            steps.append((jk, i, first_q))
    for t, (jk, i, first_q) in enumerate(steps):
        fl = 0
        if i == first_q:
            fl |= F_ROW_FIRST
        if i == nqb - 1:
            fl |= F_ROW_LAST
        if t == 0:
            fl |= F_BH_FIRST
        if t == len(steps) - 1:
            fl |= F_BH_LAST
        iqs.append(i)
        iks.append(jk)
        fls.append(fl)
    return (_np.asarray(iqs, _np.int32), _np.asarray(iks, _np.int32),
            _np.asarray(fls, _np.int32))


def _fused_bwd_kernel(iq_t, ik_t, fl_t, q_ref, k_ref, v_ref, g_ref, lse_ref,
                      delta_ref, dq_ref, dk_ref, dv_ref, dq_acc, dk_acc, dv_acc,
                      *, scale, skv, bq, bk, sqp, diag_cond, pad, hi_prec):
    t = pl.program_id(1)
    iq = iq_t[t]
    ik = ik_t[t]
    flags = fl_t[t]

    @pl.when((flags & F_BH_FIRST) != 0)
    def _init_dq():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when((flags & F_ROW_FIRST) != 0)
    def _init_dkv():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    prec = jax.lax.Precision.HIGHEST if hi_prec else None
    in_dt = q_ref.dtype

    def fp(x):
        return x.astype(jnp.float32) if hi_prec else x

    def mxu(x):
        return x if hi_prec else x.astype(in_dt)

    q = fp(q_ref[0])
    k = fp(k_ref[0])
    v = fp(v_ref[0])
    g = fp(g_ref[0])
    lse = lse_ref[0]      # (bq, 128) lane-replicated, exp2 domain
    delta = delta_ref[0]  # (bq, 128) lane-replicated

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    if diag_cond:
        full = ik * bk + (bk - 1) <= iq * bq
        if pad:
            full = full & (ik * bk + bk <= skv)

        def _mask(x):
            row = iq * _np.int32(bq) + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            col = ik * _np.int32(bk) + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            ok = col <= row
            if pad:
                ok = ok & (col < _np.int32(skv))
            return jnp.where(ok, x, NEG_INF)

        s = jax.lax.cond(full, lambda x: x, _mask, s)
    else:
        row = iq * _np.int32(bq) + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        col = ik * _np.int32(bk) + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        ok = col <= row
        if pad:
            ok = ok & (col < _np.int32(skv))
        s = jnp.where(ok, s, NEG_INF)

    p = jnp.exp2(s - _lanes(lse, s.shape[1]))

    # dv += p^T g
    dv_acc[:] += jax.lax.dot_general(
        mxu(p), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # dp = g v^T ; ds = p * (dp - delta)   (natural-domain ds)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    ds = mxu(p * (dp - _lanes(delta, dp.shape[1])))
    # dk += ds^T q_pass   (absorbs ln2 at flush)
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # dq_acc[rows of iq] += ds k   (absorbs `scale` at flush)
    upd = jax.lax.dot(ds, k, preferred_element_type=jnp.float32, precision=prec)
    rows = pl.ds(iq * bq, bq)
    dq_acc[rows, :] += upd

    @pl.when((flags & F_ROW_LAST) != 0)
    def _flush_dkv():
        dk_ref[0] = (dk_acc[:] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    @pl.when((flags & F_BH_LAST) != 0)
    def _flush_dq():
        dq_ref[0] = (dq_acc[:] * _np.float32(scale)).astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "diag_cond"))
def flash_bwd_fused(q, k, v, g, out, lse, bq=512, bk=512, diag_cond=True):
    """Fused dq/dk/dv.  lse is the NATURAL-log per-row logsumexp (b,h,sq)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / math.sqrt(d)

    sqp = -(-sq // bq) * bq
    skvp = -(-skv // bk) * bk
    dp_ = -(-d // 128) * 128
    pad = skvp != skv
    nqb, nkb = sqp // bq, skvp // bk

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    def pad_to(x, shape):
        pads = [(0, tt - ss) for ss, tt in zip(x.shape, shape)]
        return jnp.pad(x, pads) if any(pp != (0, 0) for pp in pads) else x

    qs = (q * jnp.asarray(scale * float(LOG2E), q.dtype)).reshape(b * h, sq, d)
    qf = pad_to(qs, (b * h, sqp, dp_))
    kf = pad_to(k.reshape(b * h, skv, d), (b * h, skvp, dp_))
    vf = pad_to(v.reshape(b * h, skv, d), (b * h, skvp, dp_))
    gf = pad_to(g.reshape(b * h, sq, d), (b * h, sqp, dp_))
    lse2 = (lse * LOG2E).astype(jnp.float32)
    lsef = pad_to(
        jnp.broadcast_to(lse2.reshape(b * h, sq, 1), (b * h, sq, 128)), (b * h, sqp, 128)
    )
    deltaf = pad_to(
        jnp.broadcast_to(delta.reshape(b * h, sq, 1), (b * h, sq, 128)), (b * h, sqp, 128)
    )

    iq_t, ik_t, fl_t = _bwd_tables(nqb, nkb, bq, bk)
    n_live = len(iq_t)
    i32 = _np.int32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * h, n_live),
        in_specs=[
            pl.BlockSpec((1, bq, dp_), lambda bh, t, iqt, ikt, flt: (bh, iqt[t], i32(0))),
            pl.BlockSpec((1, bk, dp_), lambda bh, t, iqt, ikt, flt: (bh, ikt[t], i32(0))),
            pl.BlockSpec((1, bk, dp_), lambda bh, t, iqt, ikt, flt: (bh, ikt[t], i32(0))),
            pl.BlockSpec((1, bq, dp_), lambda bh, t, iqt, ikt, flt: (bh, iqt[t], i32(0))),
            pl.BlockSpec((1, bq, 128), lambda bh, t, iqt, ikt, flt: (bh, iqt[t], i32(0))),
            pl.BlockSpec((1, bq, 128), lambda bh, t, iqt, ikt, flt: (bh, iqt[t], i32(0))),
        ],
        out_specs=[
            pl.BlockSpec((1, sqp, dp_), lambda bh, t, iqt, ikt, flt: (bh, i32(0), i32(0))),
            pl.BlockSpec((1, bk, dp_), lambda bh, t, iqt, ikt, flt: (bh, ikt[t], i32(0))),
            pl.BlockSpec((1, bk, dp_), lambda bh, t, iqt, ikt, flt: (bh, ikt[t], i32(0))),
        ],
        scratch_shapes=[
            pltpu.VMEM((sqp, dp_), jnp.float32),  # dq acc (whole sequence)
            pltpu.VMEM((bk, dp_), jnp.float32),   # dk acc
            pltpu.VMEM((bk, dp_), jnp.float32),   # dv acc
        ],
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, scale=scale, skv=skv, bq=bq, bk=bk, sqp=sqp,
            diag_cond=diag_cond, pad=pad, hi_prec=q.dtype == jnp.float32,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sqp, dp_), q.dtype),
            jax.ShapeDtypeStruct((b * h, skvp, dp_), k.dtype),
            jax.ShapeDtypeStruct((b * h, skvp, dp_), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * sqp * skvp * dp_ // 2,
            bytes_accessed=(qf.size * 2 + kf.size * 2 + vf.size * 2) * q.dtype.itemsize,
            transcendentals=b * h * sqp * skvp // 2,
        ),
        interpret=INTERPRET,
    )(iq_t, ik_t, fl_t, qf, kf, vf, gf, lsef, deltaf)

    dq = dq[:, :sq, :d].reshape(b, h, sq, d)
    dk = dk[:, :skv, :d].reshape(b, h, skv, d)
    dv = dv[:, :skv, :d].reshape(b, h, skv, d)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _sync(x):
    _np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def _timed(fn, iters=5):
    _sync(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from kfunca_tpu.ops.pallas_kernels.flash_attention import (
        flash_attention_backward, flash_attention_fwd_stats,
    )

    b, h, s, d = 4, 16, 2048, 128
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, s, d), dtype)
    k = jax.random.normal(kk, (b, h, s, d), dtype)
    v = jax.random.normal(kv, (b, h, s, d), dtype)
    g = jax.random.normal(kg, (b, h, s, d), dtype)

    out, lse = flash_attention_fwd_stats(q, k, v)

    # numerics vs the current two-kernel backward
    ref = flash_attention_backward(q, k, v, g, out=out, lse=lse)
    mdf = jax.jit(lambda a, b: jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    for bq, bk in [(512, 512), (1024, 512), (512, 1024), (256, 512)]:
        got = flash_bwd_fused(q, k, v, g, out, lse, bq=bq, bk=bk)
        for name, r, gg in zip("dq dk dv".split(), ref, got):
            md = float(jax.device_get(mdf(r, gg)))
            print(f"[bwd] fused{bq} {name}: maxdiff vs 2-kernel = {md:.4f}", flush=True)

    flops_fwd = 0.5 * 4 * b * h * s * s * d
    flops_bwd = flops_fwd * 2.5

    def chain_cur(K):
        @jax.jit
        def f(qq, kk_, vv, gg):
            x = qq
            for _ in range(K):
                o, l = flash_attention_fwd_stats(x, kk_, vv)
                dq, dk, dv = flash_attention_backward(x, kk_, vv, gg, out=o, lse=l)
                bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0]) > jnp.float32(1e30)).astype(x.dtype)
                x = dq + bump
            return x
        return lambda: f(q, k, v, g)

    def chain_fused(bq, bk):
        def mk(K):
            @jax.jit
            def f(qq, kk_, vv, gg):
                x = qq
                for _ in range(K):
                    o, l = flash_attention_fwd_stats(x, kk_, vv)
                    dq, dk, dv = flash_bwd_fused(x, kk_, vv, gg, o, l, bq=bq, bk=bk)
                    bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0]) > jnp.float32(1e30)).astype(x.dtype)
                    x = dq + bump
                return x
            return lambda: f(q, k, v, g)
        return mk

    variants = {
        "fused512": chain_fused(512, 512),
        "fused1024x512": chain_fused(1024, 512),
        "fused512x1024": chain_fused(512, 1024),
        "fused256x512": chain_fused(256, 512),
    }
    k1, k2 = 2, 8
    chains = {n: (mk(k1), mk(k2)) for n, mk in variants.items()}
    results = {n: [] for n in variants}
    for r in range(4):
        for n, (f1, f2) in chains.items():
            t1, t2 = _timed(f1), _timed(f2)
            dt = max((t2 - t1) / (k2 - k1), 1e-9)
            tf = (flops_fwd + flops_bwd) / dt / 1e12
            results[n].append((dt, tf))
            print(f"[bwd] r{r} {n}: {dt*1e3:.3f} ms fwd+bwd -> {tf:.1f} TFLOP/s", flush=True)
    print("[bwd] === medians ===", flush=True)
    for n, xs in results.items():
        xs.sort()
        dt, tf = xs[len(xs) // 2]
        print(f"[bwd] {n}: {dt*1e3:.3f} ms -> {tf:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
