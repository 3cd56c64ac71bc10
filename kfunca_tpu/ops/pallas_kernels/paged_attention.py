"""Paged decode attention: one query token per sequence against a paged KV
pool, reading ONLY the live pages.

The serving engine (models/serve.py) stores KV in fixed-size pages; its XLA
decode path gathers every sequence's FULL page-table width from HBM each
step, including pages past the sequence length and trash pages.  This
kernel makes the decode read ragged-aware:

  * grid (B, max_pages), page fetch driven by the PAGE TABLE via scalar
    prefetch: the BlockSpec index map looks the page id up in the table, so
    only referenced pages are DMA'd;
  * steps past a sequence's live page count CLAMP to its first page
    (refetch elided by Mosaic) and skip compute — HBM traffic per step is
    O(tokens actually in the cache), the paged-attention property;
  * online-softmax carry across a sequence's pages in VMEM scratch; the
    within-page causal/ragged mask comes from the decode position.

Layout: the kernel works per (page, H*hd) block with fp32 math on the VPU —
decode attention is bandwidth-bound (one query row per sequence), so lane
utilization on the loads is what matters, not the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = _np.float32(-1e30)


def _decode_kernel(
    tables_ref, positions_ref, q_ref, *rest,
    page, h, hkv, hd, max_pages, window=None, quantized=False, fanin=1
):
    # rest layout: k_0..k_{F-1}, v_0..v_{F-1}, [sk_0.., sv_0..,] o, m, l, acc
    k_refs = rest[:fanin]
    v_refs = rest[fanin:2 * fanin]
    at = 2 * fanin
    if quantized:
        # int8 KV pools travel with per-(slot, kv-head) fp32 scales
        # (models/serve.quantize_kv); dequant happens here in VMEM so the
        # HBM page reads stay int8 — the point of the feature
        sk_refs = rest[at:at + fanin]
        sv_refs = rest[at + fanin:at + 2 * fanin]
        at += 2 * fanin
    o_ref, m_ref, l_ref, acc_ref = rest[at:at + 4]
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = positions_ref[b]  # index of the query token (attends <= pos)
    n_live = jax.lax.div(pos, _np.int32(page)) + _np.int32(1)
    first_live = _np.int32(0)
    if window is not None:
        # sliding window: pages entirely below (pos - window] are dead —
        # the scheduler has usually FREED them already (their table entries
        # point at recycled pages), so they must be neither read nor masked
        first_live = jnp.maximum(
            _np.int32(0),
            jax.lax.div(pos - _np.int32(window) + _np.int32(1), _np.int32(page)),
        )

    # fanin > 1: each grid step consumes `fanin` pages (separate DMA'd
    # inputs of the same pool, index maps j*fanin+g) — fewer grid steps
    # amortize the per-step Mosaic overhead that dominates decode at small
    # page counts (tools_r4_kv8_probe.py)
    for g in range(fanin):
        jj = j * _np.int32(fanin) + _np.int32(g)

        @pl.when((jj < n_live) & (jj >= first_live))
        def _compute(g=g, jj=jj):
            q = q_ref[0].astype(jnp.float32)  # (H, hd)
            k = k_refs[g][0].astype(jnp.float32)  # (page, Hkv, hd)
            v = v_refs[g][0].astype(jnp.float32)
            # int8 scales are FOLDED into the (H, page) score matrix and
            # the probability weights, not applied element-wise on k/v —
            # s = (q . k_int8) * sk and p' = p * sv are O(H*page) VPU work
            # vs O(page*Hkv*hd) for scaling the vectors themselves (the
            # element-wise form made the int8 kernel 2x SLOWER than bf16
            # despite half the DMA, tools_r4_kv8_probe.py)
            sk = sk_refs[g][0] if quantized else None  # (page, Hkv) f32
            sv = sv_refs[g][0] if quantized else None
            if hkv == h:
                # s[h, p] = sum_d q[h, d] * k[p, h, d]
                s = jnp.sum(q[None, :, :] * k, axis=-1).T  # (H, page)
                if quantized:
                    s = s * sk.T
            else:
                # GQA: each group of h//hkv query heads reads one kv head.
                # Static per-kv-head loop — Mosaic rejects the batched
                # einsum ("batch dims must be equal"), and hkv is tiny
                group = h // hkv
                parts = []
                for kk in range(hkv):
                    qk = q[kk * group:(kk + 1) * group]  # (group, hd)
                    kp = k[:, kk, :]  # (page, hd)
                    part = jnp.sum(qk[None, :, :] * kp[:, None, :], axis=-1).T
                    if quantized:
                        part = part * sk[:, kk][None, :]
                    parts.append(part)
                s = jnp.concatenate(parts, axis=0)  # (H, page)
            # ragged mask: global slot index of column p is jj*page + p
            slot = jj * _np.int32(page) + jax.lax.broadcasted_iota(
                jnp.int32, (h, page), 1)
            ok = slot <= pos
            if window is not None:
                ok = ok & (slot > pos - _np.int32(window))
            s = jnp.where(ok, s, NEG_INF)

            m_prev = m_ref[:, 0:1]  # (H, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)  # masked slots underflow to exact 0
            l_ref[:] = jnp.broadcast_to(
                l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True),
                l_ref.shape,
            )
            if hkv == h:
                pw = p * sv.T if quantized else p  # fold v-scales into p
                # acc[h, d] += sum_p pw[h, p] * v[p, h, d]
                acc_ref[:] = acc_ref[:] * alpha + jnp.sum(
                    pw.T[:, :, None] * v, axis=0
                )
            else:
                group = h // hkv
                parts = []
                for kk in range(hkv):
                    pk = p[kk * group:(kk + 1) * group]  # (group, page)
                    if quantized:
                        pk = pk * sv[:, kk][None, :]
                    vp = v[:, kk, :]  # (page, hd)
                    parts.append(
                        jnp.sum(pk.T[:, :, None] * vp[:, None, :], axis=0))
                acc_ref[:] = acc_ref[:] * alpha + jnp.concatenate(parts,
                                                                  axis=0)
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == pl.num_programs(1) - 1)
    def _store():
        l_safe = jnp.where(l_ref[:, 0:1] == 0.0, _np.float32(1.0), l_ref[:, 0:1])
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


def _decode_kernel_mxu(
    tables_ref, positions_ref, qbd_ref, k_ref, v_ref, *rest,
    page, h, hkv, hd, max_pages, window=None, quantized=False
):
    """MXU variant: scores and PV ride two plain 2-D dots over the flat
    (page, Hkv*hd) KV tiles — a host-built block-diagonal q expansion
    contracts straight to (H, page) (no transposes, no per-head loops, one
    path for MHA and GQA).  Mosaic rejects both in-kernel lane-merging
    reshapes and batched matvec dots (tools_r4 kern_tune2/3 logs), so the
    flattening happens in the wrapper's BlockSpecs and the block-diagonal
    on the host."""
    if quantized:
        sk_ref, sv_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    group = h // hkv

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = positions_ref[b]
    n_live = jax.lax.div(pos, _np.int32(page)) + _np.int32(1)
    first_live = _np.int32(0)
    if window is not None:
        first_live = jnp.maximum(
            _np.int32(0),
            jax.lax.div(pos - _np.int32(window) + _np.int32(1), _np.int32(page)),
        )

    @pl.when((j < n_live) & (j >= first_live))
    def _compute():
        # bf16 models run the dots at the native bf16 MXU rate with fp32
        # accumulation (fp32-operand MXU passes measured 40% SLOWER than
        # the VPU chain, bf16 4x faster; int8 pool values cast into bf16
        # exactly).  fp32 models keep fp32 operands for oracle parity.
        cdt = (jnp.bfloat16 if o_ref.dtype == jnp.bfloat16
               else jnp.float32)
        qbd = qbd_ref[0].astype(cdt)  # (Hkv*hd, H) block-diag over kv heads
        k = k_ref[0].astype(cdt)  # (page, Hkv*hd)
        v = v_ref[0].astype(cdt)
        s = jax.lax.dot_general(
            qbd, k, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, page)
        if quantized:
            skt = sk_ref[0].T  # (Hkv, page)
            svt = sv_ref[0].T
            if group > 1:  # expand kv-head scales to query-head rows
                skt = jnp.concatenate(
                    [jnp.broadcast_to(skt[kk:kk + 1], (group, page))
                     for kk in range(hkv)], axis=0)
                svt = jnp.concatenate(
                    [jnp.broadcast_to(svt[kk:kk + 1], (group, page))
                     for kk in range(hkv)], axis=0)
            s = s * skt
        slot = j * _np.int32(page) + jax.lax.broadcasted_iota(
            jnp.int32, (h, page), 1)
        ok = slot <= pos
        if window is not None:
            ok = ok & (slot > pos - _np.int32(window))
        s = jnp.where(ok, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape,
        )
        pw = p * svt if quantized else p
        full = jax.lax.dot_general(
            pw.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, Hkv*hd); the (query-head, kv-head) diagonal blocks are
        #    the answer, cross terms are discarded below
        row = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
        upd = jnp.zeros((h, hd), jnp.float32)
        for kk in range(hkv):
            upd = upd + jnp.where(
                row // _np.int32(group) == kk,
                full[:, kk * hd:(kk + 1) * hd], _np.float32(0.0))
        acc_ref[:] = acc_ref[:] * alpha + upd
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == pl.num_programs(1) - 1)
    def _store():
        l_safe = jnp.where(l_ref[:, 0:1] == 0.0, _np.float32(1.0), l_ref[:, 0:1])
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


def _expand_kv_rows(skt, h, hkv, page):
    """(Hkv, page) per-kv-head values -> (H, page) per-query-head rows."""
    group = h // hkv
    if group == 1:
        return skt
    return jnp.concatenate(
        [jnp.broadcast_to(skt[kk:kk + 1], (group, page)) for kk in range(hkv)],
        axis=0)


def _decode_kernel_dma(
    tables_ref, positions_ref, qbd_ref, kpool_ref, *rest,
    page, h, hkv, hd, max_pages, depth, window=None, quantized=False,
    page_base=0, fused=False,
):
    """Manual-DMA decode: grid (B,), KV pools stay in HBM (memory_space
    ANY); the kernel issues its own `depth`-deep pipelined async copies of
    EXACTLY the live pages (dynamic fori_loop trip count — no clamped dead
    steps, no per-page grid-step overhead, which dominates the BlockSpec
    variant: tools_r5_decode_probe measured it at ~15% of its own DMA
    roofline with the bytes nowhere near the bound).

    Layout is the flat-minor form throughout: pool pages are (page, Hkv*hd)
    rows (contiguous 2-4KB DMA descriptors; the 4-D (page, Hkv, hd<128)
    form is a hard Mosaic error — VMEM tiles pad the minor dim to 128 lanes
    and the pool slice comes out misaligned) and scale pools are HEAD-MAJOR
    (Hkv, page) so their VMEM tiles are lane-aligned too.  Scores and PV
    ride the same block-diagonal MXU dots as _decode_kernel_mxu; the
    (query-head, kv-head) diagonal extraction is deferred to ONE fold at
    the end by keeping acc as (H, Hkv*hd).

    fused=True: ONE pool holds k|v side by side per page row (page,
    2*Hkv*hd) — one data DMA (+ one scale DMA) per page instead of two
    (four), halving the per-page DMA-issue overhead that the probe shows
    dominating.  The fused scale pool is SLOT-MAJOR and lane-padded,
    (page, 128) rows whose first 2*Hkv lanes are [sk_h0..sk_h{Hkv-1},
    sv_h0..]: the serving engine's per-token scale write is then the same
    clean row scatter as the data write (the head-major layout's
    .at[li, ps, :, off] lane scatter compiled pathologically), and the
    kernel recovers head-major rows with one tiny selector dot per page
    (exact: f32 decomposes exactly into bf16 hi+lo passes under HIGHEST,
    and selection multiplies by 1)."""
    if fused:
        if quantized:
            (spool_ref, o_ref, kbuf, sbuf,
             m_ref, l_ref, acc_ref, sems) = rest
        else:
            o_ref, kbuf, m_ref, l_ref, acc_ref, sems = rest
            spool_ref = sbuf = None
        vpool_ref = vbuf = skbuf = svbuf = None
        skpool_ref = svpool_ref = None
    elif quantized:
        (vpool_ref, skpool_ref, svpool_ref, o_ref,
         kbuf, vbuf, skbuf, svbuf, m_ref, l_ref, acc_ref, sems) = rest
        spool_ref = sbuf = None
    else:
        vpool_ref, o_ref, kbuf, vbuf, m_ref, l_ref, acc_ref, sems = rest
        skpool_ref = svpool_ref = skbuf = svbuf = None
        spool_ref = sbuf = None
    b = pl.program_id(0)
    pos = positions_ref[b]
    n_live = jax.lax.div(pos, _np.int32(page)) + _np.int32(1)
    first_live = _np.int32(0)
    if window is not None:
        first_live = jnp.maximum(
            _np.int32(0),
            jax.lax.div(pos - _np.int32(window) + _np.int32(1),
                        _np.int32(page)),
        )
    n_steps = n_live - first_live

    def dmas(i, slot):
        jj = first_live + i
        pid = tables_ref[b, jj] + _np.int32(page_base)
        # NB: literal sem indices must be int32 — python ints weak-promote
        # to i64 under the package's x64 mode and tpu.memref_slice rejects it
        out = [
            pltpu.make_async_copy(kpool_ref.at[pid], kbuf.at[slot],
                                  sems.at[slot, _np.int32(0)]),
        ]
        if not fused:
            out.append(
                pltpu.make_async_copy(vpool_ref.at[pid], vbuf.at[slot],
                                      sems.at[slot, _np.int32(1)]))
        if quantized:
            if fused:
                out.append(
                    pltpu.make_async_copy(spool_ref.at[pid], sbuf.at[slot],
                                          sems.at[slot, _np.int32(1)]))
            else:
                out += [
                    pltpu.make_async_copy(skpool_ref.at[pid], skbuf.at[slot],
                                          sems.at[slot, _np.int32(2)]),
                    pltpu.make_async_copy(svpool_ref.at[pid], svbuf.at[slot],
                                          sems.at[slot, _np.int32(3)]),
                ]
        return out

    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    # warm-up: fill the pipeline depth-1 deep (slot i%depth is overwritten
    # by step i+depth-1's start — one slot must stay free for the step
    # being computed, so the lookahead is depth-1, not depth)
    def warm(i, c):
        @pl.when(i < n_steps)
        def _():
            for d in dmas(i, jax.lax.rem(i, _np.int32(depth))):
                d.start()
        return c
    # int32 bounds: python-int bounds weak-promote to int64 under the
    # package's x64 mode and Mosaic's i64->i32 conversion recurses to death
    # the carry must be int32 too — a weak python 0 promotes to i64 under
    # the package's x64 mode (same Mosaic recursion hazard as the bounds)
    jax.lax.fori_loop(jnp.asarray(0, jnp.int32),
                      jnp.asarray(depth - 1, jnp.int32), warm,
                      jnp.asarray(0, jnp.int32))

    # bf16 MXU passes for bf16 models (fp32-operand passes measured 40%
    # slower than the VPU chain in tools_r4 kern_tune); fp32 keeps fp32
    # with HIGHEST precision (default MXU precision decomposes f32 into
    # bf16 passes — 1.8e-3 error vs the f32 VPU oracle)
    cdt = jnp.bfloat16 if o_ref.dtype == jnp.bfloat16 else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if cdt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    qbd = qbd_ref[0].astype(cdt)  # (Hkv*hd, H) block-diag over kv heads
    if fused and quantized:
        # selector for the slot-major scale rows: skv = SEL . sp^T puts
        # lane r of every slot's scale row into row r (exact under HIGHEST)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (2 * hkv, 128), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (2 * hkv, 128), 1)
               ).astype(jnp.float32)

    def body(i, c):
        slot = jax.lax.rem(i, _np.int32(depth))
        ahead = i + _np.int32(depth - 1)

        @pl.when(ahead < n_steps)
        def _():
            for d in dmas(ahead, jax.lax.rem(ahead, _np.int32(depth))):
                d.start()
        for d in dmas(i, slot):
            d.wait()
        jj = first_live + i
        if fused:
            kv = kbuf[slot]  # (page, 2*Hkv*hd), k | v side by side
            k = kv[:, :hkv * hd].astype(cdt)
            v = kv[:, hkv * hd:].astype(cdt)
        else:
            k = kbuf[slot].astype(cdt)  # (page, Hkv*hd)
            v = vbuf[slot].astype(cdt)
        s = jax.lax.dot_general(
            qbd, k, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (H, page)
        if quantized:
            if fused:  # (page, 128) slot-major row -> (2*Hkv, page)
                skv = jax.lax.dot_general(
                    sel, sbuf[slot], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                sk = skv[:hkv]
            else:
                skv = None
                sk = skbuf[slot]
            s = s * _expand_kv_rows(sk, h, hkv, page)
        slot_ids = jj * _np.int32(page) + jax.lax.broadcasted_iota(
            jnp.int32, (h, page), 1)
        ok = slot_ids <= pos
        if window is not None:
            ok = ok & (slot_ids > pos - _np.int32(window))
        s = jnp.where(ok, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape,
        )
        if quantized:
            sv = skv[hkv:] if fused else svbuf[slot]
            p = p * _expand_kv_rows(sv, h, hkv, page)
        full = jax.lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (H, Hkv*hd); cross-head blocks are garbage, dropped in the fold
        acc_ref[:] = acc_ref[:] * alpha + full
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        return c

    jax.lax.fori_loop(jnp.asarray(0, jnp.int32), n_steps, body,
                      jnp.asarray(0, jnp.int32))
    l_safe = jnp.where(l_ref[:, 0:1] == 0.0, _np.float32(1.0), l_ref[:, 0:1])
    group = h // hkv
    row = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
    acc = acc_ref[:]  # slice the VALUE: ref slices at hd<128 lane offsets
    out = jnp.zeros((h, hd), jnp.float32)  # are misaligned with VMEM tiling
    for kk in range(hkv):  # extract each query row's own kv-head block
        out = out + jnp.where(row // _np.int32(group) == kk,
                              acc[:, kk * hd:(kk + 1) * hd],
                              _np.float32(0.0))
    o_ref[0] = (out / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "window", "interpret", "page_base", "depth", "head_major_scales"))
def paged_decode_attention_dma(q, pool_k, pool_v, page_tables, positions,
                               window=None, scales=None, interpret=False,
                               page_base: int = 0, depth: int | None = None,
                               head_major_scales: bool = False):
    """Manual-DMA variant of paged_decode_attention (same contract): the
    pools never enter the BlockSpec pipeline — the kernel DMAs exactly the
    live pages itself, `depth`-deep.  Grid is (B,) so per-grid-step
    machinery is paid once per sequence, not once per page bundle.

    pool_k/v may be the canonical 4-D (n_pages, page, Hkv, hd) or the
    serving engine's flat 3-D (n_pages, page, Hkv*hd) — flat is the
    kernel-native form (the host reshape of a 4-D pool costs an XLA copy).
    scales: (sk, sv) in the canonical slot-major (n_pages, page, Hkv) form,
    or head-major (n_pages, Hkv, page) with head_major_scales=True (the
    serving engine stores head-major so no per-call transpose is paid)."""
    bsz, h, hd = q.shape
    fused = pool_v is None
    if fused:
        # ONE pool, k|v side by side per page row: (n_pages, page, 2*Hkv*hd)
        n_pages, page, kv2 = pool_k.shape
        hkv = kv2 // (2 * hd)
        assert kv2 == 2 * hkv * hd and h % hkv == 0, (q.shape, pool_k.shape)
        assert (hkv * hd) % 128 == 0, (
            "fused KV pages need a 128-lane-aligned k|v split "
            f"(hkv*hd = {hkv * hd})")
    elif pool_k.ndim == 3:
        n_pages, page, hkvhd = pool_k.shape
        hkv = hkvhd // hd
        assert hkvhd % hd == 0 and h % hkv == 0, (q.shape, pool_k.shape)
    else:
        n_pages, page, hkv, hd2 = pool_k.shape
        assert hd == hd2 and h % hkv == 0, (q.shape, pool_k.shape)
        pool_k = pool_k.reshape(n_pages, page, hkv * hd)
        pool_v = pool_v.reshape(n_pages, page, hkv * hd)
    max_pages = page_tables.shape[1]
    if depth is None:
        depth = max(2, min(8, max_pages))
    depth = max(1, min(int(depth), max_pages))
    quantized = scales is not None

    # host-built block-diagonal q expansion (see _decode_kernel_mxu)
    group = h // hkv
    rowk = (jnp.arange(hkv * hd, dtype=jnp.int32) // hd)[:, None]
    colk = (jnp.arange(h, dtype=jnp.int32) // group)[None, :]
    qbd = (jnp.tile(jnp.swapaxes(q, 1, 2), (1, hkv, 1))
           * (rowk == colk).astype(q.dtype))  # (B, Hkv*hd, H)

    in_specs = [
        pl.BlockSpec((1, hkv * hd, h),
                     lambda b, t, p: (b, _np.int32(0), _np.int32(0))),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [qbd, pool_k]
    if not fused:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(pool_v)
    if quantized:
        if fused:
            # one slot-major lane-padded (n_pages, page, 128) scale pool;
            # each row's first 2*Hkv lanes are [sk_h... | sv_h...]
            skv = scales[0] if isinstance(scales, tuple) else scales
            assert 2 * hkv <= 128, hkv
            assert skv.shape == (n_pages, page, 128), skv.shape
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            operands.append(skv.astype(jnp.float32))
        else:
            sk, sv = scales
            if not head_major_scales:
                sk = jnp.swapaxes(sk, 1, 2)  # -> (n_pages, Hkv, page)
                sv = jnp.swapaxes(sv, 1, 2)
            in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                         pl.BlockSpec(memory_space=pl.ANY)]
            operands += [sk.astype(jnp.float32), sv.astype(jnp.float32)]

    kv_mult = 2 if fused else 1
    scratch = [
        pltpu.VMEM((depth, page, kv_mult * hkv * hd), pool_k.dtype),  # kbuf
    ]
    if not fused:
        scratch.append(pltpu.VMEM((depth, page, hkv * hd), pool_v.dtype))
    if quantized:
        if fused:
            scratch.append(pltpu.VMEM((depth, page, 128), jnp.float32))
        else:
            scratch += [pltpu.VMEM((depth, hkv, page), jnp.float32),
                        pltpu.VMEM((depth, hkv, page), jnp.float32)]
    scratch += [
        pltpu.VMEM((h, 128), jnp.float32),  # m
        pltpu.VMEM((h, 128), jnp.float32),  # l
        pltpu.VMEM((h, hkv * hd), jnp.float32),  # acc
        pltpu.SemaphoreType.DMA((depth, 4)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, h, hd), lambda b, t, p: (b, _np.int32(0), _np.int32(0))
        ),
        scratch_shapes=scratch,
    )
    vmem_limit = max(
        64 * 1024 * 1024,
        int(depth * page * hkv * hd * pool_k.dtype.itemsize * 4),
    )
    return pl.pallas_call(
        functools.partial(
            _decode_kernel_dma, page=page, h=h, hkv=hkv, hd=hd,
            max_pages=max_pages, depth=depth, window=window,
            quantized=quantized, page_base=page_base, fused=fused,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(page_tables.astype(jnp.int32), positions.astype(jnp.int32), *operands)


@functools.partial(jax.jit, static_argnames=("window", "interpret",
                                             "page_base", "fanin", "mxu"))
def paged_decode_attention(q, pool_k, pool_v, page_tables, positions, window=None,
                           scales=None, interpret=False, page_base: int = 0,
                           fanin: int | None = None, mxu: bool = False):
    """q: (B, H, hd) PRE-SCALED by 1/sqrt(hd); pool_k/v: (n_pages, page, H, hd);
    page_tables: (B, max_pages) int32; positions: (B,) int32 (query's slot).
    Returns (B, H, hd) attention outputs over slots <= position per sequence.

    scales: optional (scale_k, scale_v) pair of (n_pages, page, Hkv) fp32
    arrays for int8-quantized pools (models/serve.quantize_kv) — each KV
    vector is stored as int8 * scale; dequantization runs in VMEM after the
    page DMA, so HBM decode traffic drops ~2x vs bf16 (~4x vs fp32) pools.

    page_base: static page-id offset added to every table lookup.  The
    serving engine stores KV as ONE (L, n_pages, ...) stack; passing the
    free (L*n_pages, ...) reshaped view with page_base=li*n_pages lets the
    kernel read layer li's pages straight out of the stack — materializing
    the pools[li] slice as an XLA copy cost ~0.5 ms/step at B=8
    (tools_r4_decode_decomp.py).

    fanin: pages consumed per grid step (None = auto).  Each of the fanin
    pages rides its own DMA'd input block (index maps j*fanin+g), shrinking
    the grid to (B, ceil(max_pages/fanin)) — per-grid-step overhead, not
    page DMA, dominates decode at production page counts.
    """
    bsz, h, hd = q.shape
    if pool_k.ndim == 3:
        # pre-flattened (n_pages, page, Hkv*hd) pools (the serving layout:
        # an XLA reshape here would MATERIALIZE a relayout copy of the
        # whole pool on every call — the last-two-dims tiling changes)
        n_pages, page, hkvhd = pool_k.shape
        hkv = hkvhd // hd
        assert hkvhd % hd == 0 and h % hkv == 0, (q.shape, pool_k.shape)
        if not mxu:
            raise ValueError("flat 3-D pools require the mxu kernel path")
    else:
        n_pages, page, hkv, hd2 = pool_k.shape
        assert hd == hd2 and h % hkv == 0, (q.shape, pool_k.shape)
    max_pages = page_tables.shape[1]
    if fanin is None:
        # cover typical max_pages in <= 2-4 steps without over-fetching
        # tiny tables; VMEM stays small (fanin * 2 pages in flight)
        fanin = 1 if max_pages <= 2 else min(4, max_pages)
    fanin = max(1, min(int(fanin), max_pages))
    grid_j = -(-max_pages // fanin)

    def live_page(b, jj, tables, positions):
        # clamp dead steps into the live page range (refetch elided)
        pos = positions[b]
        n_live = jax.lax.div(pos, _np.int32(page)) + _np.int32(1)
        live_j = jnp.minimum(jj, n_live - _np.int32(1))
        if window is not None:
            first_live = jnp.maximum(
                _np.int32(0),
                jax.lax.div(pos - _np.int32(window) + _np.int32(1), _np.int32(page)),
            )
            live_j = jnp.maximum(live_j, first_live)
        # fanin tails can push jj past the table width: stay in bounds
        live_j = jnp.minimum(live_j, _np.int32(max_pages - 1))
        return tables[b, live_j] + _np.int32(page_base)

    def page_idx(g):
        def idx(b, j, tables, positions):
            jj = j * _np.int32(fanin) + _np.int32(g)
            return (live_page(b, jj, tables, positions),
                    _np.int32(0), _np.int32(0), _np.int32(0))
        return idx

    def page_idx3(g):  # rank-3 scale pools
        def idx(b, j, tables, positions):
            jj = j * _np.int32(fanin) + _np.int32(g)
            return (live_page(b, jj, tables, positions),
                    _np.int32(0), _np.int32(0))
        return idx

    if mxu and fanin == 1:
        # flat (page, Hkv*hd) KV blocks (free host reshape of the pools)
        # + host-built block-diagonal q expansion; see _decode_kernel_mxu
        group = h // hkv
        rowk = (jnp.arange(hkv * hd, dtype=jnp.int32) // hd)[:, None]
        colk = (jnp.arange(h, dtype=jnp.int32) // group)[None, :]
        qbd = (jnp.tile(jnp.swapaxes(q, 1, 2), (1, hkv, 1))
               * (rowk == colk).astype(q.dtype))  # (B, Hkv*hd, H), q.dtype
        in_specs = [
            pl.BlockSpec((1, hkv * hd, h),
                         lambda b, j, t, p: (b, _np.int32(0), _np.int32(0))),
            pl.BlockSpec((1, page, hkv * hd), page_idx3(0)),
            pl.BlockSpec((1, page, hkv * hd), page_idx3(0)),
        ]
        operands = [qbd,
                    pool_k if pool_k.ndim == 3
                    else pool_k.reshape(n_pages, page, hkv * hd),
                    pool_v if pool_v.ndim == 3
                    else pool_v.reshape(n_pages, page, hkv * hd)]
        if scales is not None:
            in_specs += [pl.BlockSpec((1, page, hkv), page_idx3(0)),
                         pl.BlockSpec((1, page, hkv), page_idx3(0))]
            operands += [scales[0].astype(jnp.float32),
                         scales[1].astype(jnp.float32)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz, max_pages),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, h, hd), lambda b, j, t, p: (b, _np.int32(0), _np.int32(0))
            ),
            scratch_shapes=[
                pltpu.VMEM((h, 128), jnp.float32),  # m
                pltpu.VMEM((h, 128), jnp.float32),  # l
                pltpu.VMEM((h, hd), jnp.float32),  # acc
            ],
        )
        return pl.pallas_call(
            functools.partial(
                _decode_kernel_mxu, page=page, h=h, hkv=hkv, hd=hd,
                max_pages=max_pages, window=window,
                quantized=scales is not None,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, h, hd), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(page_tables.astype(jnp.int32), positions.astype(jnp.int32),
          *operands)

    in_specs = [
        # Mosaic constrains only the LAST TWO block dims ((8,128)-divisible
        # or equal to the array dims): (h, hd) trailing dims satisfy that
        # for any head count, so no reshapes are needed anywhere
        pl.BlockSpec((1, h, hd), lambda b, j, t, p: (b, _np.int32(0), _np.int32(0))),
    ]
    in_specs += [pl.BlockSpec((1, page, hkv, hd), page_idx(g))
                 for g in range(fanin)]
    in_specs += [pl.BlockSpec((1, page, hkv, hd), page_idx(g))
                 for g in range(fanin)]
    operands = [q] + [pool_k] * fanin + [pool_v] * fanin
    if scales is not None:
        sk = scales[0].astype(jnp.float32)
        sv = scales[1].astype(jnp.float32)
        in_specs += [pl.BlockSpec((1, page, hkv), page_idx3(g))
                     for g in range(fanin)]
        in_specs += [pl.BlockSpec((1, page, hkv), page_idx3(g))
                     for g in range(fanin)]
        operands += [sk] * fanin + [sv] * fanin

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, grid_j),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, h, hd), lambda b, j, t, p: (b, _np.int32(0), _np.int32(0))
        ),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),  # m
            pltpu.VMEM((h, 128), jnp.float32),  # l
            pltpu.VMEM((h, hd), jnp.float32),  # acc
        ],
    )
    # fanin lanes multiply the in-flight block bytes; the default 16MB
    # scoped-VMEM cap is 24KB short at fanin=8 bf16 (page 128, 16 heads,
    # hd 64) — raise it to the blocks' actual double-buffered footprint
    # plus headroom (v5e VMEM is far larger than the 16MB default scope)
    blk_bytes = sum(
        int(_np.prod(s.block_shape)) * op.dtype.itemsize
        for s, op in zip(in_specs, operands)
    )
    vmem_limit = max(32 * 1024 * 1024, int(blk_bytes * 2.5))
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, page=page, h=h, hkv=hkv, hd=hd, max_pages=max_pages,
            window=window, quantized=scales is not None, fanin=fanin,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(page_tables.astype(jnp.int32), positions.astype(jnp.int32), *operands)
    return out
