"""Serving engine: paged KV cache, batched decode, sampling, scheduler.

Green-field capability (the reference ships no serving; this rounds out the
framework's production story).  TPU-first construction:

  * **Paged KV cache** — per layer, a bounded pool of fixed-size pages
    `(n_pages, page_size, H, hd)` in HBM.  A sequence owns a page table
    (static-shape `(max_pages,)` int32); growing a sequence allocates pages
    from the native free-list allocator (csrc kf_page_pool_*), so memory is
    bounded and recycled across requests instead of sized for the worst
    case per slot.  Static shapes everywhere: one compiled decode step
    serves every batch composition (no recompiles as requests churn).
  * **Batched decode step** — ONE jitted program per step: embed the B
    last tokens, per layer scatter the new K/V into the pools (donated:
    XLA updates HBM in place), gather each sequence's pages via its page
    table, attend with a position mask, then sample.  Gathers/scatters are
    batched advanced indexing, which XLA lowers to efficient dynamic
    gather/scatter on TPU.
  * **Sampling** — greedy, temperature, nucleus (top-p), top-k, and min-p
    over the full sorted vocab (lax.top_k is avoided: k >= ~2049 crashes
    the TPU compiler — see ROADMAP known hazards).  Params are PER
    REQUEST: overrides become traced (B,) vectors so one compiled step
    serves a mixed greedy/sampled batch; per-request EOS overrides and
    multi-token stop sequences end requests host-side.
  * **Continuous batching scheduler** — fixed decode slots; a native FIFO
    queue (csrc kf_queue_*) holds waiting requests; when a sequence
    finishes (EOS or max_new), its pages are freed and the next request is
    admitted with a prefill.  Throughput comes from keeping slots full,
    not from dynamic shapes.

Prefill reuses generate.forward_with_cache (dense, flash-sized matmuls on
the MXU), then the dense prompt cache is scattered into the paged pools.

Round-3 additions:
  * **Prefix caching** (prefix_cache=True) — full prompt pages are
    content-hashed (chained per-page hash, keyed by adapter) and shared
    read-only between sequences; admission reuses the longest cached page
    prefix and prefills only the suffix.  Pages are refcounted; cache-only
    pages evict LRU under pool pressure.
  * **Multi-LoRA** (max_loras>0) — stacked per-layer wqkv adapters with
    per-slot selection inside the ONE compiled decode step (mixed-adapter
    batches); prefill runs the adapter's merged weights (cached per id).
  * The ragged paged-decode Pallas kernel measures 1587-1601 decode tok/s
    vs 944-1219 for the gather path at B=4/8 (bench.py decode_tokens_per_s).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime import _native
from .generate import _rope_at, forward_with_cache, init_kv_cache
from .transformer import TransformerConfig, apply_norm


# ---------------------------------------------------------------------------
# page allocator (native free-list with Python fallback)
# ---------------------------------------------------------------------------


class PagePool:
    """Free-list allocator over `n_pages` KV pages (native kf_page_pool_*)."""

    def __init__(self, n_pages: int):
        self.n_pages = n_pages
        self._lib = _native.get_lib()
        if self._lib is not None:
            self._id = self._lib.kf_page_pool_create(n_pages)
        else:
            self._free = list(range(n_pages - 1, -1, -1))

    def alloc(self, count: int) -> list[int] | None:
        """`count` page indices, or None if the pool can't satisfy it."""
        if count == 0:
            return []
        if self._lib is not None:
            out = _native.i64_array([0] * count)
            if self._lib.kf_page_alloc(self._id, count, out) < 0:
                return None
            return [out[i] for i in range(count)]
        if len(self._free) < count:
            return None
        pages = [self._free.pop() for _ in range(count)]
        return pages

    def free(self, pages: list[int]) -> None:
        if not pages:
            return
        if self._lib is not None:
            arr = _native.i64_array(list(pages))
            self._lib.kf_page_free(self._id, len(pages), arr)
        else:
            self._free.extend(pages)

    @property
    def available(self) -> int:
        if self._lib is not None:
            return int(self._lib.kf_page_pool_available(self._id))
        return len(self._free)


class RequestQueue:
    """FIFO admission queue (native kf_queue_*)."""

    def __init__(self):
        self._lib = _native.get_lib()
        if self._lib is not None:
            self._id = self._lib.kf_queue_create()
        else:
            self._items = []

    def push(self, item: int) -> None:
        if self._lib is not None:
            self._lib.kf_queue_push(self._id, item)
        else:
            self._items.append(item)

    def pop(self) -> int | None:
        if self._lib is not None:
            v = int(self._lib.kf_queue_pop(self._id))
            return None if v < 0 else v
        return self._items.pop(0) if self._items else None

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.kf_queue_size(self._id))
        return len(self._items)


class PrefixIndex:
    """LRU-ordered prefix-cache index: chained prompt-page content hash ->
    KV page id (native kf_pcache_*; OrderedDict-semantics Python fallback).

    Keys are opaque hashables: (u64, u64) pairs from the native 128-bit
    splitmix chain, or 20-byte sha1 digests from the fallback — both commit
    to the whole token prefix [0, (i+1)*page_size) and the adapter id."""

    def __init__(self):
        self._lib = _native.get_lib()
        if self._lib is not None:
            self._id = self._lib.kf_pcache_create()
        else:
            self._d: dict = {}

    def hash_chain(self, prompt, page_size: int, seed: int) -> list:
        """One chained content hash per FULL page of `prompt` under `seed`
        (the LoRA adapter id)."""
        import numpy as np

        n_pages = len(prompt) // page_size
        if n_pages == 0:
            return []
        if self._lib is not None:
            import ctypes

            toks = np.ascontiguousarray(prompt, dtype=np.int32)
            out = (ctypes.c_uint64 * (2 * n_pages))()
            self._lib.kf_pcache_hash_chain(
                toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(toks), page_size, seed, out,
            )
            return [(out[2 * i], out[2 * i + 1]) for i in range(n_pages)]
        import hashlib

        hashes, h = [], np.int32(seed).tobytes()
        for i in range(n_pages):
            h = hashlib.sha1(
                h + np.asarray(prompt[i * page_size : (i + 1) * page_size],
                               np.int32).tobytes()
            ).digest()
            hashes.append(h)
        return hashes

    def get(self, key):
        """Mapped page id, or None (does NOT touch LRU order)."""
        if self._lib is not None:
            v = int(self._lib.kf_pcache_get(self._id, key[0], key[1]))
            return None if v < 0 else v
        return self._d.get(key)

    def touch(self, key) -> None:
        """Move an entry to most-recently-used."""
        if self._lib is not None:
            self._lib.kf_pcache_touch(self._id, key[0], key[1])
        elif key in self._d:
            self._d[key] = self._d.pop(key)

    def put(self, key, page: int) -> bool:
        """Insert at MRU; False (and no change) if the key already exists."""
        if self._lib is not None:
            return int(self._lib.kf_pcache_put(self._id, key[0], key[1], page)) == 1
        if key in self._d:
            return False
        self._d[key] = page
        return True

    def erase(self, key):
        """Remove; returns the page that was mapped, or None."""
        if self._lib is not None:
            v = int(self._lib.kf_pcache_erase(self._id, key[0], key[1]))
            return None if v < 0 else v
        return self._d.pop(key, None)

    def lru_items(self) -> list:
        """(key, page) snapshot in LRU order, oldest first."""
        if self._lib is not None:
            import ctypes

            n = int(self._lib.kf_pcache_size(self._id))
            if n <= 0:
                return []
            ab = (ctypes.c_uint64 * (2 * n))()
            pages = _native.i64_array([0] * n)
            n = int(self._lib.kf_pcache_lru(self._id, ab, pages, n))
            return [((ab[2 * i], ab[2 * i + 1]), int(pages[i])) for i in range(n)]
        return list(self._d.items())

    def __len__(self) -> int:
        if self._lib is not None:
            return max(0, int(self._lib.kf_pcache_size(self._id)))
        return len(self._d)

    def __contains__(self, key) -> bool:
        return self.get(key) is not None


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("temperature", "top_p"))
def sample_tokens(logits, key, temperature=0.0, top_p=1.0):
    """(B, V) logits -> (B,) int32 tokens.  Greedy when temperature == 0;
    nucleus filtering keeps the smallest prefix of the sorted distribution
    whose cumulative probability reaches top_p."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / jnp.float32(temperature)
    if top_p >= 1.0:
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    # full-vocab sort (lax.top_k with large k crashes the TPU compiler)
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    sorted_idx = jnp.argsort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < jnp.float32(top_p)  # always keeps the top token
    filtered = jnp.where(keep, sorted_logits, jnp.float32(-1e30))
    choice = jax.random.categorical(key, filtered, axis=-1)
    return jnp.take_along_axis(sorted_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


@jax.jit
def token_logprobs(logits, tokens):
    """(B, V) raw logits + (B,) chosen tokens -> (B,) fp32 log-probs under
    the model's (untempered) distribution."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, tokens[:, None].astype(jnp.int32), axis=-1)
    return picked[:, 0] - lse


@jax.jit
def sample_tokens_per_slot(logits, key, temperature, top_p, top_k, min_p):
    """Per-slot sampling: every parameter is a TRACED (B,) vector so one
    compiled program serves a batch mixing greedy and differently-tuned
    sampled requests (continuous batching must not recompile on admission).

    temperature <= 0 -> greedy for that slot.  Filters compose on the
    sorted distribution: nucleus (top_p), top_k rank cut (top_k <= 0 = off),
    and min_p (keep tokens with prob >= min_p * max_prob); the argmax token
    always survives.  Full-vocab sort, not lax.top_k (which crashes the
    TPU compiler for k >= ~2049)."""
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = jnp.maximum(temperature.astype(jnp.float32), 1e-6)[:, None]
    scaled = logits / t
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    sorted_idx = jnp.argsort(scaled, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p.astype(jnp.float32)[:, None]
    ranks = jnp.arange(logits.shape[-1], dtype=jnp.int32)[None, :]
    k = top_k.astype(jnp.int32)[:, None]
    keep &= jnp.where(k > 0, ranks < k, True)
    keep &= probs >= min_p.astype(jnp.float32)[:, None] * probs[:, :1]
    keep = keep.at[:, 0].set(True)
    filtered = jnp.where(keep, sorted_logits, jnp.float32(-1e30))
    choice = jax.random.categorical(key, filtered, axis=-1)
    sampled = jnp.take_along_axis(sorted_idx, choice[:, None], axis=-1)[:, 0]
    return jnp.where(temperature > 0.0, sampled.astype(jnp.int32), greedy)


# ---------------------------------------------------------------------------
# batched paged decode step (one compiled program)
# ---------------------------------------------------------------------------


def _mm(y, w):
    """Decode-path matmul: fp weight, or a quantized pair from
    quantize_decode_params — (int8, (n,) col-scales) runs w8a8 (gemm_w8:
    half the weight HBM traffic, 2x int8 MXU rate), (int4, (g, n) group
    scales) runs w4a8 (gemm_w4: quarter the traffic, batched-group int8
    MXU dots).  The isinstance/dtype checks are trace-time static (the
    params pytree structure is fixed per compile)."""
    if isinstance(w, tuple):
        from ..ops.quant import gemm_w4, gemm_w8

        y2 = y.reshape(-1, y.shape[-1]).astype(jnp.float32)
        gemm = gemm_w4 if w[0].dtype == jnp.int4 else gemm_w8
        out = gemm(y2, w[0], w[1], out_dtype=jnp.float32)
        return out.reshape(y.shape[:-1] + (w[0].shape[1],))
    return jnp.dot(y, w.astype(y.dtype), preferred_element_type=jnp.float32)


def _w4_group(k: int) -> int:
    """Largest power-of-two group <= 128 dividing k (group-wise int4
    scales must tile the contraction dim exactly)."""
    for g in (128, 64, 32, 16, 8, 4, 2):
        if k % g == 0:
            return g
    return k


def quantize_decode_params(params, bits: int = 8):
    """Symmetric quantization of every decode-path matrix: block weights
    become (intN, scale) pairs and the tied LM head is materialized
    quantized as "lm_head" (embed.T) — the paged decode step dispatches on
    the pair structure (_mm).  The embedding gather and norm gains stay
    fp32.  Returns a NEW params pytree for the decode step; keep the fp
    params for prefill (accuracy + LoRA merging).

    bits=8: per-output-column int8 (w8a8).  bits=4: group-wise int4
    (quantize_cols_int4; scales per (k-group, column)) — half the resident
    weight memory of int8 again, for accuracy-tolerant deployments."""
    from ..ops.quant import quantize_cols, quantize_cols_int4

    if bits == 8:
        quant = quantize_cols
    elif bits == 4:
        quant = lambda w: quantize_cols_int4(w, group=_w4_group(w.shape[0]))
    else:
        raise ValueError(f"unsupported weight bits {bits} (8 or 4)")
    def qblk(blk):
        out = {}
        for k, v in blk.items():
            if k in ("wqkv", "wo", "w_gate", "w_up", "w_down",
                     "w_fc", "w_proj"):
                out[k] = quant(v)
            elif k == "experts":  # MoE: every expert's SwiGLU quantizes;
                out[k] = [  # the (tiny, routing-critical) router stays fp
                    {n: quant(w) for n, w in ex.items()} for ex in v
                ]
            else:
                out[k] = v
        return out

    out = dict(params)
    out["blocks"] = [qblk(blk) for blk in params["blocks"]]
    head = params.get("lm_head")
    out["lm_head"] = quant(
        jnp.transpose(params["embed"]) if head is None else head
    )
    return out


def _paged_block(x, p, pools_k, pools_v, li, page_tables, positions, cfg,
                 page_size, engine, lora=None):
    """One transformer block over B single tokens against paged KV.

    x: (B, 1, dm); pools_k/v: the FULL (L, n_pages, page, H, hd) stacked
    pools — or, in the fused single-chip layout (pools_v=None), ONE
    (L, n_pages, page, 2*H*hd) stack of [k | v] page rows.  The block
    scatters its new K/V at [li, page, offset] in place (one
    dynamic-update-slice on the donated buffer) and the attention
    kernel reads the layer slice.  Keeping the stack intact is load-bearing
    for throughput: the previous per-layer unstack + jnp.stack restack
    materialized a full copy of both pools every step (~2.5 ms of the
    4.4 ms step at B=8, tools_r4_decode_decomp.py — a 2.4x decode tax).
    page_tables: (B, max_pages) int32; positions: (B,) int32 (index of the
    new token).
    lora: optional (A (n_adapters, dm, r), B_ (n_adapters, r, 3*dm),
    ids (B,)) — per-SLOT low-rank wqkv deltas (adapter 0 is the zero/base
    adapter); decode applies x @ A[id] @ B[id] batched, so one compiled
    step serves a mixed-adapter batch.
    Returns (x, pools_k, pools_v)."""
    b = x.shape[0]
    h, hd = cfg.n_heads, cfg.head_dim
    max_pages = page_tables.shape[1]

    y = apply_norm(x, p, "attn_norm", cfg)
    qkv = _mm(y, p["wqkv"])
    if "bqkv" in p:  # optional QKV bias (Qwen2/GPT-2-family HF imports)
        qkv = qkv + p["bqkv"]
    if lora is not None:
        A, B_, ids = lora
        ya = jnp.einsum("btd,bdr->btr", y.astype(jnp.float32), A[ids])
        qkv = qkv + jnp.einsum("btr,bro->bto", ya, B_[ids])
    from .transformer import apply_qk_norm, split_qkv

    q, k, v = split_qkv(qkv.astype(y.dtype), cfg)  # q (B,H,1,hd), k/v (B,Hkv,1,hd)
    q, k = apply_qk_norm(q, k, p, cfg)  # Qwen3-family per-head q/k norm
    hkv = cfg.kv_heads

    if cfg.pos == "rope":
        # RoPE at each sequence's own absolute position (vmap over batch)
        _theta, _pscale = cfg.rope_params()
        rope = jax.vmap(
            lambda xx, pos: _rope_at(
                xx[None], pos[None], _theta, _pscale, cfg.rope_pct)[0])
        q = rope(q, positions)
        k = rope(k, positions)

    # scatter the new K/V into the stacked pools at (li, page_of(pos),
    # pos % page) — an in-place dynamic-update-slice on the donated stack
    page_slot = page_tables[jnp.arange(b), positions // page_size]  # (B,)
    offset = positions % page_size
    kv_quant = isinstance(pools_k, tuple)  # int8 KV: (pool_q8, scales) pairs
    # fused layout (pools_v is None): pools_k is ONE stack of fused page
    # rows (L, n_pages, page, 2*Hkv*hd) = [k | v] halves, quantized form
    # (int8 stack, fp32 head-major (L, n_pages, 2*Hkv, page) scales).  One
    # page = ONE contiguous DMA in the decode kernel — measured 710 GB/s
    # (87% HBM roofline) vs 290 for split pools (tools_r5_decode_probe).
    fused = pools_v is None
    if fused and kv_quant:
        from ..ops.quant import quantize_vecs

        qk, sk_new = quantize_vecs(k[:, :, 0])  # (B, Hkv, hd), (B, Hkv)
        qv, sv_new = quantize_vecs(v[:, :, 0])
        kvnew = jnp.concatenate(
            [qk.reshape(b, -1), qv.reshape(b, -1)], axis=-1)
        # scale rows are slot-major lane-padded (page, 128): the write is
        # the same clean row scatter as the data write (a head-major
        # .at[li, ps, :, off] lane scatter compiled pathologically)
        scnew = jnp.concatenate([sk_new, sv_new], axis=-1)  # (B, 2*Hkv)
        scnew = jnp.pad(scnew, ((0, 0), (0, 128 - scnew.shape[1])))
        pools_k = (pools_k[0].at[li, page_slot, offset].set(kvnew),
                   pools_k[1].at[li, page_slot, offset].set(scnew))
    elif fused:
        kvnew = jnp.concatenate(
            [k[:, :, 0].reshape(b, -1), v[:, :, 0].reshape(b, -1)], axis=-1)
        pools_k = pools_k.at[li, page_slot, offset].set(
            kvnew.astype(pools_k.dtype))
    elif kv_quant:
        from ..ops.quant import quantize_vecs

        qk, sk_new = quantize_vecs(k[:, :, 0])  # (B, Hkv, hd), (B, Hkv)
        qv, sv_new = quantize_vecs(v[:, :, 0])
        pools_k = (pools_k[0].at[li, page_slot, offset].set(qk),
                   pools_k[1].at[li, page_slot, offset].set(sk_new))
        pools_v = (pools_v[0].at[li, page_slot, offset].set(qv),
                   pools_v[1].at[li, page_slot, offset].set(sv_new))
    else:
        newk = k[:, :, 0].astype(pools_k.dtype)  # (B, H, hd)
        newv = v[:, :, 0].astype(pools_v.dtype)
        pools_k = pools_k.at[li, page_slot, offset].set(newk)
        pools_v = pools_v.at[li, page_slot, offset].set(newv)

    scale = 1.0 / math.sqrt(hd)
    # engine is a STATIC argument resolved at dispatch time by the caller
    # (the repo's dispatch-time-engine rule, see ops/gemm.py): an env read
    # inside this jitted trace would be baked at first compile and silently
    # ignore later KFUNCA_FORCE_XLA flips
    if engine == "pallas" and x.dtype in (jnp.float32, jnp.bfloat16):
        # ragged paged-attention kernel: reads ONLY live pages via the
        # page table (scalar-prefetched index maps); validated vs the
        # gather path below (tests + on-chip oracle check).  The kernel
        # reads layer li's pages straight from the stacked pool via a free
        # flattened view + page_base — no pools[li] slice copy.
        from ..ops.pallas_kernels.paged_attention import (
            paged_decode_attention, paged_decode_attention_dma)

        n_pages = (pools_k[0] if kv_quant else pools_k).shape[1]
        _flat = lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
        qs = (q[:, :, 0] * jnp.asarray(scale, q.dtype))  # (B, H, hd)
        if fused and kv_quant:
            attn = paged_decode_attention_dma(
                qs, _flat(pools_k[0]), None, page_tables, positions,
                window=cfg.attention_window, scales=_flat(pools_k[1]),
                page_base=li * n_pages,
            )
        elif fused:
            attn = paged_decode_attention_dma(
                qs, _flat(pools_k), None, page_tables, positions,
                window=cfg.attention_window, page_base=li * n_pages,
            )
        elif kv_quant:
            attn = paged_decode_attention(
                qs, _flat(pools_k[0]), _flat(pools_v[0]), page_tables,
                positions, window=cfg.attention_window,
                scales=(_flat(pools_k[1]), _flat(pools_v[1])),
                page_base=li * n_pages,
            )
        else:
            attn = paged_decode_attention(
                qs, _flat(pools_k), _flat(pools_v), page_tables, positions,
                window=cfg.attention_window, page_base=li * n_pages,
            )
        attn = attn.astype(x.dtype).reshape(b, 1, h * hd)
    else:
        # XLA gather path (oracle + CPU tier): reads the full table width.
        # GQA: grouped queries (B, Hkv, G, 1, hd) against the shared kv head
        group = h // hkv
        L = max_pages * page_size
        if fused:
            src = (pools_k[0] if kv_quant else pools_k)[li]
            kv = src[page_tables]  # (B, maxp, page, 2*Hkv*hd)
            if kv_quant:
                sc = pools_k[1][li][page_tables]  # (B, maxp, page, 128)
                scexp = jnp.repeat(sc[..., :2 * hkv], hd, axis=-1)
                kv = kv.astype(jnp.float32) * scexp
            kc = kv[..., :hkv * hd]
            vc = kv[..., hkv * hd:]
        else:
            pool_k = ((pools_k[0][li], pools_k[1][li]) if kv_quant
                      else pools_k[li])
            pool_v = ((pools_v[0][li], pools_v[1][li]) if kv_quant
                      else pools_v[li])
            if kv_quant:
                kc = (pool_k[0][page_tables].astype(jnp.float32)
                      * pool_k[1][page_tables][..., None])
                vc = (pool_v[0][page_tables].astype(jnp.float32)
                      * pool_v[1][page_tables][..., None])
            else:
                kc, vc = pool_k[page_tables], pool_v[page_tables]
        kc = kc.reshape(b, L, hkv, hd).transpose(0, 2, 1, 3)
        vc = vc.reshape(b, L, hkv, hd).transpose(0, 2, 1, 3)
        qg = q.reshape(b, hkv, group, 1, hd)
        s = jnp.einsum(
            "bkgtd,bkld->bkgtl", qg.astype(jnp.float32), kc.astype(jnp.float32)
        ) * scale
        l_pos = jnp.arange(L, dtype=jnp.int32)[None, None, None, None, :]
        pos5 = positions[:, None, None, None, None]
        mask = l_pos <= pos5
        if cfg.attention_window is not None:
            mask = mask & (l_pos > pos5 - cfg.attention_window)
        s = jnp.where(mask, s, jnp.float32(-1e30))
        prob = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum(
            "bkgtl,bkld->bkgtd", prob, vc.astype(jnp.float32)
        ).astype(x.dtype)
        attn = attn.reshape(b, h, 1, hd).transpose(0, 2, 1, 3).reshape(b, 1, h * hd)
    o = _mm(attn, p["wo"])
    if "bo" in p:  # optional output-projection bias (GPT-2/NeoX family)
        o = o + p["bo"]
    from .transformer import mlp as _mlp

    # _mlp dispatches dense/GELU/MoE; _mm handles quantized (intN, scale)
    if cfg.parallel_residual:  # GPT-NeoX/GPT-J: branches share the input
        y = apply_norm(x, p, "mlp_norm", cfg)
        return (x + o.astype(x.dtype) + _mlp(y, p, cfg, mm=_mm).astype(x.dtype),
                pools_k, pools_v)
    x = x + o.astype(x.dtype)
    y = apply_norm(x, p, "mlp_norm", cfg)
    x = x + _mlp(y, p, cfg, mm=_mm).astype(x.dtype)
    return x, pools_k, pools_v


def _decode_step_impl(
    params, pools_k, pools_v, page_tables, positions, last_tokens, key,
    cfg: TransformerConfig, page_size: int, temperature=0.0, top_p=1.0,
    engine="xla", lora=None, sampling=None, penalties=None,
):
    """One batched decode step over paged KV (trace body — see the jitted
    paged_decode_step wrapper and the multi-step paged_decode_burst).

    `sampling`, when given, is a dict of TRACED (B,) vectors
    {temperature, top_p, top_k, min_p} enabling per-slot sampling params
    (sample_tokens_per_slot); it overrides the static temperature/top_p.

    pools_k/v: (L, n_pages, page, H, hd) stacked per-layer pools (donated —
    XLA updates the pool in place in HBM); with quantize_kv they are
    (int8 pool, fp32 (L, n_pages, page, H) scale pool) pairs and the
    donation covers both leaves.  Fused layout: pools_v=None and pools_k
    is the single [k | v] page-row stack (see _paged_block) — the decode
    kernel then runs the one-DMA-per-page fast path.
    Returns (new_tokens (B,), pools_k, pools_v).  Inactive slots decode
    garbage harmlessly (their pages are reserved); callers ignore them.
    """
    from .transformer import embed_tokens

    x = embed_tokens(params, last_tokens[:, None], cfg)  # (B, 1, dm)
    if cfg.pos == "learned":  # per-slot absolute position (GPT-2 family)
        x = x + jnp.take(params["pos_embed"], positions, axis=0)[
            :, None].astype(cfg.act_dtype)
    # int8 KV pools travel as (q8 pool, scale pool) pairs; each block
    # scatters into the stacked pools in place (donated buffers) — no
    # per-layer unstack/restack, which cost a full pool copy per step
    # (tools_r4_decode_decomp.py: 4.44 -> 1.88 ms/step at B=8 bf16)
    for li, p in enumerate(params["blocks"]):
        x, pools_k, pools_v = _paged_block(
            x, p, pools_k, pools_v, li, page_tables, positions,
            cfg, page_size,
            engine, lora=None if lora is None else (lora[0][li], lora[1][li], lora[2]),
        )
    x = apply_norm(x, params, "final_norm", cfg)
    if "lm_head" in params:
        # untied HF head (fp array) or the quantized tied/untied head
        # ((int8, scale) pair) — _mm dispatches on the structure
        logits = _mm(x[:, 0], params["lm_head"])
    else:
        logits = jnp.dot(
            x[:, 0], params["embed"].T.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    raw = logits
    if penalties is not None:
        logits = apply_logit_penalties(logits, penalties)
    if sampling is not None:
        tokens = sample_tokens_per_slot(
            logits, key, sampling["temperature"], sampling["top_p"],
            sampling["top_k"], sampling["min_p"],
        )
    else:
        tokens = sample_tokens(logits, key, temperature=temperature, top_p=top_p)
    # logprob of each chosen token under the model's RAW distribution
    # (untempered, pre-penalty log-softmax — the vLLM/OpenAI-API convention)
    lp = token_logprobs(raw, tokens)
    return tokens, lp, pools_k, pools_v


paged_decode_step = partial(
    jax.jit,
    static_argnames=("cfg", "page_size", "temperature", "top_p", "engine"),
    donate_argnums=(1, 2),
)(_decode_step_impl)


@partial(
    jax.jit,
    static_argnames=("cfg", "page_size", "steps", "temperature", "top_p",
                     "engine"),
    donate_argnums=(1, 2),
)
def paged_decode_burst(
    params, pools_k, pools_v, page_tables, positions, last_tokens, key,
    cfg: TransformerConfig, page_size: int, steps: int, temperature=0.0,
    top_p=1.0, engine="xla", lora=None, sampling=None, penalties=None,
):
    """`steps` decode steps in ONE compiled program (lax.scan).

    The single-step server pays one host->device dispatch per generated
    token; over a relayed/remote runtime that round-trip, not the device
    step, bounds throughput.  Bursting amortizes it `steps`-fold — the
    vLLM "multi-step scheduling" idea.  Host-side bookkeeping (EOS/stop
    detection, page-table edits, admission) happens AFTER the burst: the
    scheduler accepts tokens up to each sequence's finish and discards the
    tail (pages for max_new are reserved at admission, so over-decoding
    past a finish writes only into pages the slot already owns, and slots
    past their stop just decode garbage that is never surfaced).

    Repetition/presence/frequency penalty COUNTS are advanced on-device
    between burst steps; the per-slot penalty coefficients, logit bias and
    sampling params stay constant within a burst.  Constrained decoding
    (allowed_fn grammars) needs per-token host callbacks — callers must
    fall back to single steps (InferenceServer does).

    Returns (tokens (steps, B), logprobs (steps, B), pools_k, pools_v).
    """
    bsz = positions.shape[0]

    def body(carry, _):
        pk, pv, pos, toks, key, counts = carry
        key, sub = jax.random.split(key)
        pen = penalties if counts is None else {**penalties, "counts": counts}
        t, lp, pk, pv = _decode_step_impl(
            params, pk, pv, page_tables, pos, toks, sub, cfg, page_size,
            temperature, top_p, engine, lora=lora, sampling=sampling,
            penalties=pen,
        )
        if counts is not None:
            counts = counts.at[jnp.arange(bsz), t].add(1.0)
        return (pk, pv, pos + 1, t, key, counts), (t, lp)

    counts0 = None if penalties is None else penalties["counts"].astype(
        jnp.float32)
    (pools_k, pools_v, _, _, _, _), (toks, lps) = jax.lax.scan(
        body, (pools_k, pools_v, positions, last_tokens, key, counts0),
        None, length=steps,
    )
    return toks, lps, pools_k, pools_v


def apply_logit_penalties(logits, penalties):
    """Logit processors over each slot's token-count history (prompt +
    generated, maintained host-side by the scheduler).  HF-convention
    repetition penalty: positive logits divide, negative multiply;
    OpenAI-convention presence (per seen token) + frequency (per
    occurrence); additive per-token logit bias.  penalties: dict of
    counts (B,V), rep (B,), presence (B,), freq (B,), bias (B,V)."""
    counts = penalties["counts"].astype(jnp.float32)  # (B, V)
    seen = counts > 0
    rep = penalties["rep"][:, None]
    logits = jnp.where(
        seen, jnp.where(logits > 0, logits / rep, logits * rep), logits
    )
    return (logits
            - penalties["freq"][:, None] * counts
            - penalties["presence"][:, None] * seen
            + penalties["bias"])


def _decode_engine() -> str:
    """Engine choice for the paged decode step, read at DISPATCH time."""
    from ..runtime.backend import use_pallas

    return "pallas" if use_pallas() else "xla"


def decode_param_specs(params):
    """Megatron-style TP PartitionSpecs for the decode params pytree —
    qkv/gate/up column-parallel, wo/down row-parallel (one psum per pair,
    inserted by GSPMD), norms + embedding replicated (the embedding gather
    is tiny at decode; the LM head is column-parallel).  Quantized (int8,
    scale) pairs shard the scale with the matrix's OUTPUT dim: col-parallel
    scales follow "tp", row-parallel scales replicate."""
    from jax.sharding import PartitionSpec as P

    def col(v):
        if isinstance(v, tuple):
            # int8 scales are (n,); int4 group scales are (k/g, n)
            sspec = P("tp") if v[1].ndim == 1 else P(None, "tp")
            return (P(None, "tp"), sspec)
        return P(None, "tp")

    def row(v):
        if isinstance(v, tuple):
            # int4 group scales shard their k-group axis with the matrix
            sspec = P() if v[1].ndim == 1 else P("tp", None)
            return (P("tp", None), sspec)
        return P("tp", None)

    def blk_spec(blk):
        s = {
            "attn_norm": P(), "mlp_norm": P(),
            "wqkv": col(blk["wqkv"]), "wo": row(blk["wo"]),
        }
        if "experts" in blk:  # MoE: each expert shards like a dense MLP;
            s["router"] = P()  # the router is tiny and replicated
            s["experts"] = [
                {"w_gate": col(ex["w_gate"]), "w_up": col(ex["w_up"]),
                 "w_down": row(ex["w_down"])}
                for ex in blk["experts"]
            ]
        elif "w_fc" in blk:  # GPT-2-family GELU MLP
            s["w_fc"] = col(blk["w_fc"])
            s["w_proj"] = row(blk["w_proj"])
        else:
            s["w_gate"] = col(blk["w_gate"])
            s["w_up"] = col(blk["w_up"])
            s["w_down"] = row(blk["w_down"])
        if "bqkv" in blk:
            s["bqkv"] = P("tp")  # column-parallel bias
        if "b_fc" in blk:
            s["b_fc"] = P("tp")  # column-parallel bias
        for name in ("bo", "b_proj"):  # row-parallel outputs: replicated
            if name in blk:  # (added once after the psum)
                s[name] = P()
        for name in ("attn_norm_b", "mlp_norm_b"):
            if name in blk:
                s[name] = P()
        return s

    specs = {
        "embed": P(), "final_norm": P(),
        "blocks": [blk_spec(b) for b in params["blocks"]],
    }
    if "pos_embed" in params:
        specs["pos_embed"] = P()
    if "final_norm_b" in params:
        specs["final_norm_b"] = P()
    if "lm_head" in params:
        specs["lm_head"] = col(params["lm_head"])
    return specs


# ---------------------------------------------------------------------------
# scheduler: continuous batching over fixed decode slots
# ---------------------------------------------------------------------------


@dataclass
class Request:
    req_id: int
    prompt: np.ndarray  # (T,) int32
    max_new: int
    tokens: list = field(default_factory=list)  # generated
    done: bool = False
    lora_id: int = 0
    # per-request sampling overrides (None -> the server-wide default)
    temperature: float | None = None
    top_p: float | None = None
    top_k: int = 0  # 0 = off
    min_p: float = 0.0
    eos: int | None = None  # overrides the server eos_token
    # stop sequences: generation ends when the tail of the output matches
    # any of these token tuples (the stop tokens stay in the output)
    stop: tuple = ()
    # per-token log-prob of each generated token under the model's raw
    # (untempered) distribution — parallel to `tokens`
    logprobs: list = field(default_factory=list)
    # logit processors (HF/OpenAI conventions): repetition_penalty
    # divides positive / multiplies negative logits of any seen token
    # (prompt + generated); presence/frequency subtract per seen-token /
    # per occurrence; logit_bias is an additive token -> bias map
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    logit_bias: dict | None = None
    # constrained decoding: host callback (generated_tokens, prompt) ->
    # (V,) bool allowed mask (or None = unconstrained this step); called
    # before every sample, so grammar/JSON automata plug in directly
    allowed_fn: object = None
    # wall-clock latency marks (perf_counter): TTFT/TPOT metrics
    submitted_at: float = 0.0
    first_token_at: float = 0.0
    finished_at: float = 0.0
    # set by InferenceServer.cancel(): the request ended early at the
    # client's ask (done=True; tokens hold whatever was generated so far)
    cancelled: bool = False


class InferenceServer:
    """Continuous-batching inference over a paged KV cache.

    `batch_slots` sequences decode together in one compiled step; finished
    sequences release their pages and waiting requests are admitted with a
    prefill.  All sampling parameters are per-server (one compiled step),
    matching the static-shape discipline.
    """

    def __init__(
        self,
        params,
        cfg: TransformerConfig,
        batch_slots: int = 4,
        page_size: int | None = 16,
        n_pages: int = 256,
        max_pages_per_seq: int = 16,
        temperature: float = 0.0,
        top_p: float = 1.0,
        eos_token: int | None = None,
        seed: int = 0,
        prefix_cache: bool = False,
        max_loras: int = 0,
        lora_rank: int = 8,
        quantize_weights: bool = False,
        quantize_kv: bool = False,
        mesh=None,
        prefill_chunk: int | None = None,
        decode_burst: int = 1,
        fused_pool: bool | None = None,
    ):
        if cfg.attention_window is not None and prefix_cache:
            raise NotImplementedError(
                "prefix caching with sliding windows is not supported (a "
                "window invalidates shared-prefix reuse beyond the window)"
            )
        if cfg.attention == "mla":
            raise NotImplementedError(
                "this engine's page pools hold per-head K/V; MLA models "
                "are served by models.mla_serve.MLAServer (continuous "
                "batching over compressed-latent slots, absorbed-form "
                "decode) or decoded via models.generate.generate()"
            )
        self.params = params
        self.cfg = cfg
        self.B = batch_slots
        # weight-quantized decode: block matrices + the tied LM head become
        # (intN, scale) pairs.  quantize_weights=True/"int8" is w8a8 (half
        # the weight HBM traffic, 2x int8 MXU rate); "int4" is group-wise
        # w4a8 (quarter the traffic/footprint).  Prefill keeps the fp
        # params (compute-bound, and LoRA merges need them), so both
        # copies are resident.
        if quantize_weights:
            bits = {True: 8, "int8": 8, "int4": 4}.get(quantize_weights)
            if bits is None:
                raise ValueError(f"quantize_weights: expected bool, 'int8' "
                                 f"or 'int4', got {quantize_weights!r}")
            self._decode_params = quantize_decode_params(params, bits=bits)
        else:
            self._decode_params = params
        # tensor-parallel serving: a jax Mesh with a "tp" axis shards the
        # decode weights Megatron-style (decode_param_specs) and the KV
        # pools over kv heads; GSPMD inserts the ICI collectives inside the
        # ONE compiled decode step.  The Pallas paged kernel is per-device,
        # so mesh serving pins the GSPMD-partitionable XLA gather engine.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert "tp" in mesh.axis_names, mesh.axis_names
            specs = decode_param_specs(self._decode_params)

            def _apply(x, s):  # explicit walk: P is a tuple subclass, so
                if isinstance(x, dict):  # tree_map would descend into specs
                    return {k: _apply(v, s[k]) for k, v in x.items()}
                if isinstance(x, (list, tuple)):
                    t = type(x)
                    return t(_apply(v, ss) for v, ss in zip(x, s))
                return jax.device_put(x, NamedSharding(mesh, s))

            self._decode_params = _apply(self._decode_params, specs)
            tp = mesh.shape["tp"]
            heads_ok = cfg.kv_heads % tp == 0
            self._pool_spec = NamedSharding(
                mesh, P(None, None, None, "tp" if heads_ok else None, None)
            )
            self._pool_scale_spec = NamedSharding(
                mesh, P(None, None, None, "tp" if heads_ok else None)
            )
        if page_size is None:
            # consult the per-chip autotune cache (kfunca.autotune
            # ("decode_page", slots, H*hd, context) records the winner)
            from ..runtime import autotune as _at

            hd = cfg.d_model // cfg.n_heads
            hit = _at.lookup(
                "decode_page",
                _at.shape_bucket(batch_slots, cfg.kv_heads * hd),
                jnp.dtype(jnp.bfloat16),
            )
            page_size = int(hit["page_size"]) if hit else 16
        self.page_size = page_size
        self.max_pages = max_pages_per_seq
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.eos = eos_token
        # prefix caching (vLLM-style): full prompt pages are content-hashed
        # (chained per-page hash) and SHARED read-only between sequences —
        # admission reuses the longest cached page prefix and prefills only
        # the remainder.  Safe because RoPE positions are absolute (a page's
        # KV depends only on the token prefix) and decode never writes a
        # page at an index below the prompt tail.  Pages are refcounted;
        # cache-only pages are evicted LRU under pool pressure.
        self.prefix_cache = bool(prefix_cache)
        self._page_refs: dict[int, int] = {}
        self._pcache = PrefixIndex()  # chained page hash -> page id (LRU)
        self.prefix_hit_pages = 0
        self.prefix_fresh_pages = 0
        # multi-LoRA: stacked per-layer wqkv adapters, slot 0 = the zero
        # (base) adapter; one compiled decode step serves a mixed-adapter
        # batch via per-slot gathers.  Prefill runs with MERGED weights
        # (W + A@B materialized once per adapter) — a per-admission matmul,
        # amortized by the merged-params cache.
        self.max_loras = int(max_loras)
        self.lora_rank = int(lora_rank)
        self._n_loras = 0
        self._merged_params: dict[int, dict] = {}
        if self.max_loras:
            L, dm = cfg.n_layers, cfg.d_model
            self.lora_A = jnp.zeros((L, max_loras + 1, dm, lora_rank), jnp.float32)
            self.lora_B = jnp.zeros((L, max_loras + 1, lora_rank, cfg.qkv_out), jnp.float32)
        else:
            self.lora_A = self.lora_B = None
        self.slot_lora = np.zeros((batch_slots,), np.int32)
        # page n_pages-1 is the TRASH page: never allocated; idle slots point
        # their whole page table at it so their (harmless) decode writes
        # cannot corrupt pages owned by live sequences.
        self.trash_page = n_pages - 1
        self.pool = PagePool(n_pages - 1)
        self.queue = RequestQueue()
        # chunked prefill: a prompt suffix longer than this many tokens is
        # processed prefill_chunk tokens per scheduler iteration instead of
        # in one shot, so decoding slots keep emitting tokens while a long
        # prompt ingests — bounding the TPOT spike admission of a long
        # request otherwise inflicts on every in-flight sequence (the
        # vLLM/Sarathi "chunked prefill" schedule).  Must be a page
        # multiple so chunk boundaries align with the padded suffix.
        if prefill_chunk is not None:
            if prefill_chunk <= 0 or prefill_chunk % self.page_size:
                raise ValueError(
                    f"prefill_chunk must be a positive multiple of "
                    f"page_size={self.page_size}, got {prefill_chunk}"
                )
        self.prefill_chunk = prefill_chunk
        # multi-step scheduling: decode `decode_burst` tokens per dispatch
        # (paged_decode_burst) when no prefill is in flight and no slot is
        # grammar-constrained; host bookkeeping trims past each finish
        if decode_burst < 1:
            raise ValueError(f"decode_burst must be >= 1, got {decode_burst}")
        self.decode_burst = int(decode_burst)
        self._prefill_state: dict[int, dict] = {}  # slot -> resumable state
        self.requests: dict[int, Request] = {}
        self._next_id = 0
        self._key = jax.random.PRNGKey(seed)

        # GQA: the pools hold only kv_heads — the paged cache shrinks by
        # the group factor, the big serving-memory win
        h, hd = cfg.kv_heads, cfg.head_dim
        shape = (cfg.n_layers, n_pages, page_size, h, hd)
        # int8 KV cache: pools become (int8 pool, per-(slot, kv-head) fp32
        # scale pool) pairs — decode KV HBM traffic halves vs bf16 pools
        # (quarters vs fp32) and the pool footprint shrinks the same way,
        # so the same HBM holds ~2-4x the context.  Dequant is fused into
        # the paged kernel (VMEM, post-DMA) / the XLA gather.
        self.quantize_kv = bool(quantize_kv)
        # fused pool layout (single-chip): ONE stack of [k | v] page rows
        # (L, n_pages, page, 2*Hkv*hd) + head-major scales, signalled by
        # pools_v=None — one contiguous DMA per page in the decode kernel
        # (87% of HBM roofline, tools_r5_decode_probe).  Mesh serving keeps
        # the split per-head layout: its GSPMD engine shards pools over kv
        # heads, and a contiguous split of the fused row would put k heads
        # and v heads on different ranks.
        if fused_pool is None:  # auto; explicit False = layout A/B tests
            fused_pool = (mesh is None and (h * hd) % 128 == 0
                          and 2 * h <= 128)
        elif fused_pool:
            assert mesh is None and (h * hd) % 128 == 0 and 2 * h <= 128, (
                "fused pools need single-chip serving, 128-lane-aligned "
                f"k|v halves (kv_heads*head_dim = {h * hd}) and scale rows "
                f"that fit one 128-lane tile (2*kv_heads = {2 * h})")
        self.fused_pool = bool(fused_pool)
        if self.fused_pool:
            fshape = (cfg.n_layers, n_pages, page_size, 2 * h * hd)
            if quantize_kv:
                self.pools_k = (
                    jnp.zeros(fshape, jnp.int8),
                    jnp.ones((cfg.n_layers, n_pages, page_size, 128),
                             jnp.float32))
            else:
                self.pools_k = jnp.zeros(fshape, cfg.act_dtype)
            self.pools_v = None
        elif quantize_kv:
            self.pools_k = (jnp.zeros(shape, jnp.int8),
                            jnp.ones(shape[:-1], jnp.float32))
            self.pools_v = (jnp.zeros(shape, jnp.int8),
                            jnp.ones(shape[:-1], jnp.float32))
        else:
            self.pools_k = jnp.zeros(shape, cfg.act_dtype)
            self.pools_v = jnp.zeros(shape, cfg.act_dtype)
        if mesh is not None:
            # shard the pools over kv heads (replicate if tp doesn't divide)

            def _put(p):
                if isinstance(p, tuple):
                    return (jax.device_put(p[0], self._pool_spec),
                            jax.device_put(p[1], self._pool_scale_spec))
                return jax.device_put(p, self._pool_spec)

            self.pools_k = _put(self.pools_k)
            self.pools_v = _put(self.pools_v)
        # slot state (host-side)
        self.slot_req = [None] * self.B  # req_id or None
        self.slot_pages = [[] for _ in range(self.B)]
        self.slot_watermark = [0] * self.B  # windowed: first live page index
        self.page_tables = np.full((self.B, self.max_pages), self.trash_page, np.int32)
        self.positions = np.zeros((self.B,), np.int32)  # index of next token
        self.last_tokens = np.zeros((self.B,), np.int32)
        # per-slot sampling params (used once any request overrides the
        # server defaults; idle slots keep the defaults)
        self._per_slot_sampling = False
        self.slot_temp = np.full((self.B,), self.temperature, np.float32)
        self.slot_top_p = np.full((self.B,), self.top_p, np.float32)
        self.slot_top_k = np.zeros((self.B,), np.int32)
        self.slot_min_p = np.zeros((self.B,), np.float32)
        # logit processors: per-slot penalty params + host-side token-count
        # history (prompt + generated) and additive bias rows.  Passed into
        # the decode step as traced arrays only once a request uses them
        # (one extra compile, like per-slot sampling).
        self._per_slot_penalties = False
        self.slot_rep = np.ones((self.B,), np.float32)
        self.slot_presence = np.zeros((self.B,), np.float32)
        self.slot_freq = np.zeros((self.B,), np.float32)
        self.token_counts = np.zeros((self.B, cfg.vocab_size), np.int32)
        self.logit_bias = np.zeros((self.B, cfg.vocab_size), np.float32)

    # -- API ---------------------------------------------------------------

    def register_lora(self, adapters) -> int:
        """Register a wqkv LoRA adapter; returns its lora_id (>= 1; 0 is
        the base model).  `adapters` is a list of per-layer dicts with
        "A" (d_model, r) and "B" (r, 3*d_model) fp32 arrays."""
        if self.max_loras == 0:
            raise ValueError("server constructed with max_loras=0")
        if self._n_loras >= self.max_loras:
            raise ValueError("lora registry full")
        lid = self._n_loras + 1
        self._n_loras = lid
        for li, ad in enumerate(adapters):
            A = jnp.asarray(ad["A"], jnp.float32)
            B = jnp.asarray(ad["B"], jnp.float32)
            assert A.shape == (self.cfg.d_model, self.lora_rank), A.shape
            assert B.shape == (self.lora_rank, self.cfg.qkv_out), B.shape
            self.lora_A = self.lora_A.at[li, lid].set(A)
            self.lora_B = self.lora_B.at[li, lid].set(B)
        return lid

    def _params_for(self, lora_id: int):
        """Base params, or the adapter's MERGED weights (cached)."""
        if lora_id == 0:
            return self.params
        merged = self._merged_params.get(lora_id)
        if merged is None:
            merged = dict(self.params)
            blocks = []
            for li, blk in enumerate(self.params["blocks"]):
                blk = dict(blk)
                delta = self.lora_A[li, lora_id] @ self.lora_B[li, lora_id]
                blk["wqkv"] = blk["wqkv"] + delta.astype(blk["wqkv"].dtype)
                blocks.append(blk)
            merged["blocks"] = blocks
            self._merged_params[lora_id] = merged
        return merged

    def submit(self, prompt, max_new: int = 16, lora_id: int = 0, *,
               temperature: float | None = None, top_p: float | None = None,
               top_k: int = 0, min_p: float = 0.0, eos: int | None = None,
               stop=(), repetition_penalty: float = 1.0,
               presence_penalty: float = 0.0, frequency_penalty: float = 0.0,
               logit_bias: dict | None = None, allowed_fn=None) -> int:
        """Queue a request.  Sampling kwargs override the server defaults
        for this request only (one compiled step still serves the mixed
        batch — params become traced per-slot vectors).  `stop` is an
        iterable of token sequences; matching the output tail ends the
        request (stop tokens are kept in the output).  `repetition_penalty`
        (HF convention), `presence_penalty`/`frequency_penalty` (OpenAI
        convention) and `logit_bias` ({token: additive bias}) are applied
        to the sampling distribution each step over the request's prompt +
        generated history; reported logprobs stay raw-distribution.

        `allowed_fn(generated_tokens, prompt) -> (V,) bool | None` enables
        CONSTRAINED decoding: called on the host before every sample, its
        mask suppresses disallowed tokens (-1e30 bias) for THIS request
        only — the standard hook for grammar/JSON-schema automata
        (outlines-style DFAs).  Greedy and sampled paths both respect it;
        reported logprobs stay raw.  A mask that allows nothing leaves
        argmax on the (uniform) suppressed row — constraints must keep at
        least one token legal."""
        if lora_id and not (self.max_loras and lora_id <= self._n_loras):
            raise ValueError(f"unknown lora_id {lora_id}")
        rid = self._next_id
        self._next_id += 1
        stop = tuple(tuple(int(t) for t in s) for s in stop)
        req = Request(rid, np.asarray(prompt, np.int32), max_new,
                      lora_id=int(lora_id), temperature=temperature,
                      top_p=top_p, top_k=int(top_k), min_p=float(min_p),
                      eos=eos, stop=stop,
                      repetition_penalty=float(repetition_penalty),
                      presence_penalty=float(presence_penalty),
                      frequency_penalty=float(frequency_penalty),
                      logit_bias=dict(logit_bias) if logit_bias else None,
                      allowed_fn=allowed_fn,
                      submitted_at=time.perf_counter())
        if (temperature is not None or top_p is not None or top_k or min_p):
            # switch the decode step to per-slot sampling from now on (one
            # extra compile, then stable — never per-admission recompiles)
            self._per_slot_sampling = True
        if (repetition_penalty != 1.0 or presence_penalty or frequency_penalty
                or logit_bias or allowed_fn is not None):
            self._per_slot_penalties = True
        self.requests[rid] = req
        self.queue.push(rid)
        return rid

    def cancel(self, req_id: int) -> bool:
        """Abort a request: queued, mid-prefill, or actively decoding.

        Immediate and idempotent — pages are released now (a decoding
        slot frees this iteration; a queued request is skipped when it
        reaches the head of the queue), generated-so-far tokens stay on
        the request, and `cancelled` marks the early end.  Returns False
        if the id is unknown or the request already finished."""
        req = self.requests.get(req_id)
        if req is None or req.done:
            return False
        req.cancelled = True
        for slot in range(self.B):
            if self.slot_req[slot] == req_id:
                self._prefill_state.pop(slot, None)
                self._release(slot)  # frees pages, stamps done/finished_at
                return True
        # still queued: mark done now; _admit skips done requests when
        # they surface (RequestQueue has no random removal by design)
        req.done = True
        req.finished_at = time.perf_counter()
        return True

    def run(self, max_steps: int = 10_000) -> dict[int, list[int]]:
        """Drive admission + decode until all submitted work completes."""
        for _ in self.stream(max_steps):
            pass
        return {rid: r.tokens for rid, r in self.requests.items() if r.done}

    def stream(self, max_steps: int = 10_000):
        """Incremental driver: yields (req_id, token, logprob, finished)
        events as tokens are produced — the SSE/streaming-response shape.
        One decode step emits up to batch_slots events; admission emits
        each new request's prefill token.  run() is stream() drained.

        The consumer may submit() new requests BETWEEN yields (the
        continuous-batching pattern: feed arrivals while streaming) — the
        emit loop iterates a snapshot so the dict can grow mid-yield."""
        for _ in range(max_steps):
            before = {rid: len(r.tokens) for rid, r in self.requests.items()}
            self._admit()
            self._advance_prefills()
            active = any(
                self.slot_req[s] is not None and s not in self._prefill_state
                for s in range(self.B)
            )
            if active:
                self._step()
            for rid, r in list(self.requests.items()):
                for i in range(before.get(rid, 0), len(r.tokens)):
                    last = r.done and i == len(r.tokens) - 1
                    yield rid, r.tokens[i], r.logprobs[i], last
            if not active and not self._prefill_state and len(self.queue) == 0:
                break

    def throughput_stats(self) -> dict:
        done = [r for r in self.requests.values() if r.done]
        ttft = [r.first_token_at - r.submitted_at for r in done
                if r.first_token_at]
        tpot = [(r.finished_at - r.first_token_at) / (len(r.tokens) - 1)
                for r in done if r.finished_at and len(r.tokens) > 1]
        return {
            "completed": len(done),
            "generated_tokens": sum(len(r.tokens) for r in done),
            "pages_available": self.pool.available,
            "prefix_hit_pages": self.prefix_hit_pages,
            "prefix_fresh_pages": self.prefix_fresh_pages,
            "cached_pages": len(self._pcache),
            # latency: time-to-first-token / time-per-output-token (s).
            # TTFT includes queueing — a request admitted behind a full
            # batch waits for slots, as production metrics should show
            "mean_ttft_s": float(np.mean(ttft)) if ttft else 0.0,
            "mean_tpot_s": float(np.mean(tpot)) if tpot else 0.0,
        }

    # -- internals -----------------------------------------------------------

    def _incref(self, page: int) -> None:
        self._page_refs[page] = self._page_refs.get(page, 0) + 1

    def _decref(self, page: int) -> None:
        r = self._page_refs.get(page, 0) - 1
        if r <= 0:
            self._page_refs.pop(page, None)
            self.pool.free([page])
        else:
            self._page_refs[page] = r

    def _prefix_hashes(self, prompt: np.ndarray, lora_id: int = 0) -> list:
        """Chained content hash per FULL prompt page: page i's key commits
        to the entire token prefix [0, (i+1)*page_size) AND the adapter —
        LoRA changes the K projection, so identical prompts under different
        adapters must not share pages.  Hashing runs in the native core
        (kf_pcache_hash_chain, 128-bit splitmix chain) when available."""
        return self._pcache.hash_chain(prompt, self.page_size, lora_id)

    def _evict_one(self) -> bool:
        """Drop the least-recently-used cache entry no sequence is using."""
        for h, page in self._pcache.lru_items():
            if self._page_refs.get(page, 0) == 1:  # cache holds the only ref
                self._pcache.erase(h)
                self._decref(page)
                return True
        return False

    def _admit(self):
        for slot in range(self.B):
            if self.slot_req[slot] is not None:
                continue
            # keep trying the queue for THIS slot: a rejected (oversized)
            # request must not waste the slot for a whole round
            while True:
                if len(self.queue) == 0:
                    return
                rid = self.queue.pop()
                req = self.requests[rid]
                if req.done:  # cancelled while queued
                    continue
                t = len(req.prompt)
                total_pages = -(-(t + req.max_new) // self.page_size)
                first_page = 0
                if self.cfg.attention_window is not None:
                    # pages wholly below the first decode position's window
                    # are never read: decode starts at t, attends > t-window
                    first_page = max(0, (t - self.cfg.attention_window) // self.page_size)
                need = total_pages - first_page
                if total_pages > self.max_pages or need > self.pool.n_pages:
                    # oversized for a slot's table OR for the whole pool:
                    # reject now — requeueing a can-never-fit request would
                    # spin run() through max_steps doing nothing
                    req.done = True
                    continue
                reused = []  # (hash key, page) pairs; keys are opaque
                hashes: list = []
                if self.prefix_cache:
                    hashes = self._prefix_hashes(req.prompt, req.lora_id)
                    # never reuse the page holding the LAST prompt token:
                    # its logits seed sampling, so it must be prefilled
                    for h in hashes[: (t - 1) // self.page_size]:
                        page = self._pcache.get(h)
                        if page is None:
                            break
                        reused.append((h, page))
                fresh = None
                while True:
                    fresh = self.pool.alloc(need - len(reused))
                    if fresh is not None:
                        break
                    if not (self.prefix_cache and self._evict_one()):
                        break
                if fresh is None:
                    self.queue.push(rid)  # no memory NOW: requeue, try next round
                    return
                for h, page in reused:
                    self._incref(page)
                    self._pcache.touch(h)  # LRU: move to most-recently-used
                for page in fresh:
                    self._incref(page)
                pages = [page for _, page in reused] + fresh
                self.prefix_hit_pages += len(reused)
                self.prefix_fresh_pages += len(fresh)
                break
            self.slot_req[slot] = rid
            # slot_pages is table-index aligned: trash placeholders for the
            # below-window pages a windowed config never allocates
            self.slot_pages[slot] = [self.trash_page] * first_page + pages
            self.slot_lora[slot] = req.lora_id
            self.slot_temp[slot] = (
                self.temperature if req.temperature is None else req.temperature
            )
            self.slot_top_p[slot] = self.top_p if req.top_p is None else req.top_p
            self.slot_top_k[slot] = req.top_k
            self.slot_min_p[slot] = req.min_p
            self.slot_rep[slot] = req.repetition_penalty
            self.slot_presence[slot] = req.presence_penalty
            self.slot_freq[slot] = req.frequency_penalty
            # token-count history starts at the prompt's counts; the bias
            # row is dense per slot (vocab-sized, zero-filled)
            self.token_counts[slot] = 0
            np.add.at(self.token_counts[slot], req.prompt, 1)
            self.logit_bias[slot] = 0.0
            if req.logit_bias:
                for t, b in req.logit_bias.items():
                    self.logit_bias[slot, int(t)] = float(b)
            self.page_tables[slot] = self.trash_page
            prefix_len = len(reused) * self.page_size
            skip_len = first_page * self.page_size
            st = t - prefix_len
            if self.prefill_chunk is not None and st > self.prefill_chunk:
                # resumable chunked prefill: the page table stays parked on
                # the trash page (decode writes cannot touch this slot's
                # real pages) until the final chunk scatters;
                # _advance_prefills runs one chunk per scheduler iteration
                # so the other slots keep decoding in between
                stp = -(-st // self.page_size) * self.page_size
                tokens, cache = self._prefill_cache_init(
                    slot, req, prefix_len, stp
                )
                self._prefill_state[slot] = {
                    "req": req, "tokens": tokens, "cache": cache,
                    "prefix_len": prefix_len, "skip_len": skip_len,
                    "next": 0, "st": st, "stp": stp,
                    "hashes": hashes, "reused_n": len(reused),
                    "pages": pages, "first_page": first_page,
                }
                continue
            self.page_tables[slot, first_page : first_page + len(pages)] = pages
            first = self._prefill(slot, req, prefix_len, skip_len)
            self._finish_admission(slot, req, first, hashes, len(reused), pages)

    def _finish_admission(self, slot: int, req: Request, first: int,
                          hashes: list, reused_n: int, pages: list):
        """Post-prefill bookkeeping: publish prefix-cache pages, activate
        the slot for decode, record the first token."""
        t = len(req.prompt)
        if self.prefix_cache:
            # publish this prompt's full pages (pure prompt KV: decode
            # writes start at position t, beyond every full page)
            for i in range(reused_n, t // self.page_size):
                if self._pcache.put(hashes[i], pages[i]):
                    self._incref(pages[i])
        self.positions[slot] = t
        self.last_tokens[slot] = first
        req.tokens.append(int(first))
        req.first_token_at = time.perf_counter()
        self.token_counts[slot, int(first)] += 1
        if self._finished(req, first):
            self._release(slot)

    def _advance_prefills(self):
        """Run ONE prefill chunk for every mid-prefill slot.  A slot whose
        final chunk completes scatters its KV, installs its page table and
        becomes a decode slot on this same iteration."""
        for slot in list(self._prefill_state):
            stt = self._prefill_state[slot]
            req = stt["req"]
            c0 = stt["next"]
            cl = min(self.prefill_chunk, stt["stp"] - c0)
            logits, stt["cache"] = forward_with_cache(
                self._params_for(req.lora_id),
                stt["tokens"][:, c0 : c0 + cl], stt["cache"],
                jnp.int32(stt["prefix_len"] + c0), self.cfg,
            )
            stt["next"] = c0 + cl
            if stt["next"] < stt["stp"]:
                continue
            # final chunk (always holds the last prompt token: the suffix is
            # padded by < page_size <= prefill_chunk): scatter + activate
            self._prefill_scatter(
                slot, req, stt["cache"], stt["prefix_len"], stt["skip_len"]
            )
            fp = stt["first_page"]
            self.page_tables[slot, fp : fp + len(stt["pages"])] = stt["pages"]
            first = self._sample_first(slot, req, logits[:, stt["st"] - 1 - c0])
            del self._prefill_state[slot]
            self._finish_admission(
                slot, req, first, stt["hashes"], stt["reused_n"], stt["pages"]
            )

    def _prefill(self, slot: int, req: Request, prefix_len: int = 0,
                 skip_len: int = 0) -> int:
        """Prefill the prompt SUFFIX beyond the reused prefix, scattered
        into this slot's fresh pages.

        The suffix is PADDED to the next page multiple so prefill compiles
        once per (prefix, suffix) length BUCKET, not per length (remote
        compiles dominate cold-start otherwise). Padded tail positions
        write garbage KV, but the decode mask only admits slots <=
        position, and the first decode tokens overwrite those slots in
        order, so they are never read.

        With prefix_len > 0 the reused pages' KV is gathered from the pool
        into the dense cache so suffix attention sees the full context —
        the forward itself runs only over the suffix tokens (the compute
        prefix caching saves).  skip_len (sliding windows) marks the
        below-window region whose pages were never allocated: the dense
        prefill still computes them (the windowed mask reads only the live
        span) but nothing is scattered there."""
        cfg, t = self.cfg, len(req.prompt)
        ps = self.page_size
        st = t - prefix_len
        stp = -(-st // ps) * ps  # bucket: page multiple
        tokens, cache = self._prefill_cache_init(slot, req, prefix_len, stp)
        logits, cache = forward_with_cache(
            self._params_for(req.lora_id), tokens, cache, jnp.int32(prefix_len), cfg
        )
        self._prefill_scatter(slot, req, cache, prefix_len, skip_len)
        return self._sample_first(slot, req, logits[:, st - 1])

    def _prefill_cache_init(self, slot: int, req: Request, prefix_len: int,
                            stp: int):
        """Padded suffix tokens + a dense KV cache seeded with the reused
        prefix pages' KV gathered from the pool (dequantized if int8)."""
        cfg, t = self.cfg, len(req.prompt)
        ps = self.page_size
        st = t - prefix_len
        padded = np.zeros((stp,), np.int32)
        padded[:st] = req.prompt[prefix_len:]
        tokens = jnp.asarray(padded[None], jnp.int32)
        cache = init_kv_cache(cfg, 1, prefix_len + stp)
        if prefix_len:
            npre = prefix_len // ps
            pre_pages = jnp.asarray(self.slot_pages[slot][:npre], jnp.int32)
            hkv, hd = cfg.kv_heads, cfg.head_dim

            def _read_kv(li):
                # -> ((prefix, H, hd), (prefix, H, hd)); int8 pools dequant
                if self.fused_pool:
                    src = self.pools_k[0] if self.quantize_kv else self.pools_k
                    kv = src[li, pre_pages]  # (npre, ps, 2*Hkv*hd)
                    if self.quantize_kv:
                        sc = self.pools_k[1][li, pre_pages]  # (npre, ps, 128)
                        kv = (kv.astype(jnp.float32) * jnp.repeat(
                            sc[..., :2 * hkv], hd, axis=-1)
                        ).astype(cfg.act_dtype)
                    kv = kv.reshape(prefix_len, 2 * hkv * hd)
                    return (kv[:, :hkv * hd].reshape(prefix_len, hkv, hd),
                            kv[:, hkv * hd:].reshape(prefix_len, hkv, hd))

                def _one(pool):
                    if self.quantize_kv:
                        x = (pool[0][li, pre_pages].astype(jnp.float32)
                             * pool[1][li, pre_pages][..., None]
                             ).astype(cfg.act_dtype)
                    else:
                        x = pool[li, pre_pages]
                    return x.reshape(prefix_len, hkv, -1)
                return _one(self.pools_k), _one(self.pools_v)

            for li, lc in enumerate(cache):
                k, v = _read_kv(li)
                lc["k"] = lc["k"].at[:, :, :prefix_len].set(k.transpose(1, 0, 2)[None])
                lc["v"] = lc["v"].at[:, :, :prefix_len].set(v.transpose(1, 0, 2)[None])
        return tokens, cache

    def _prefill_scatter(self, slot: int, req: Request, cache,
                         prefix_len: int, skip_len: int):
        """Scatter the dense suffix KV into this slot's fresh pages."""
        t = len(req.prompt)
        ps = self.page_size
        n_full = t // ps
        rem = t % ps
        start_page = max(prefix_len // ps, skip_len // ps)
        pk, pv = self.pools_k, self.pools_v

        def _write(pool, li, page, n, x):
            if self.quantize_kv:
                from ..ops.quant import quantize_vecs

                q8, s = quantize_vecs(x)
                return (pool[0].at[li, page, :n].set(q8),
                        pool[1].at[li, page, :n].set(s))
            return pool.at[li, page, :n].set(x.astype(pool.dtype))

        def _write_fused(pool, li, page, n, xk, xv):
            if self.quantize_kv:
                from ..ops.quant import quantize_vecs

                q8k, sk = quantize_vecs(xk)  # (n, H, hd), (n, H)
                q8v, sv = quantize_vecs(xv)
                kv8 = jnp.concatenate(
                    [q8k.reshape(n, -1), q8v.reshape(n, -1)], axis=-1)
                sc = jnp.concatenate([sk, sv], axis=-1)  # (n, 2H)
                sc = jnp.pad(sc, ((0, 0), (0, 128 - sc.shape[1])))
                return (pool[0].at[li, page, :n].set(kv8),
                        pool[1].at[li, page, :n].set(sc))
            kvx = jnp.concatenate(
                [xk.reshape(n, -1), xv.reshape(n, -1)], axis=-1)
            return pool.at[li, page, :n].set(kvx.astype(pool.dtype))

        for li, lc in enumerate(cache):
            k = lc["k"][0].transpose(1, 0, 2)  # (prefix+stp, H, hd), absolute
            v = lc["v"][0].transpose(1, 0, 2)
            for pi in range(start_page, n_full + (1 if rem else 0)):
                page = self.slot_pages[slot][pi]
                lo = pi * ps
                n = ps if pi < n_full else rem
                if self.fused_pool:
                    pk = _write_fused(pk, li, page, n,
                                      k[lo : lo + n], v[lo : lo + n])
                else:
                    pk = _write(pk, li, page, n, k[lo : lo + n])
                    pv = _write(pv, li, page, n, v[lo : lo + n])
        self.pools_k, self.pools_v = pk, pv

    def _constraint_row(self, req: Request):
        """(V,) fp32 suppression bias from the request's allowed_fn, or
        None when unconstrained (no callback / callback returned None)."""
        if req.allowed_fn is None:
            return None
        allow = req.allowed_fn(req.tokens, req.prompt)
        if allow is None:
            return None
        allow = np.asarray(allow, bool)
        if allow.shape != (self.cfg.vocab_size,):
            raise ValueError(
                f"allowed_fn must return (vocab_size,) bool, got {allow.shape}")
        row = np.zeros((self.cfg.vocab_size,), np.float32)
        row[~allow] = np.float32(-1e30)
        return row

    def _bias_with_constraints(self):
        """Per-step (B, V) bias: static per-request logit_bias plus each
        constrained slot's allowed-token suppression (host-computed so
        grammar automata stay plain Python; identity rows untouched)."""
        bias = self.logit_bias
        copied = False
        for slot in range(self.B):
            rid = self.slot_req[slot]
            if rid is None or slot in self._prefill_state:
                continue
            req = self.requests[rid]
            row = self._constraint_row(req)
            if row is not None:
                if not copied:
                    bias = bias.copy()
                    copied = True
                bias[slot] = bias[slot] + row
        return bias

    def _sample_first(self, slot: int, req: Request, raw) -> int:
        """Sample the request's first token from its last-prompt logits."""
        self._key, sub = jax.random.split(self._key)
        last = raw
        if (req.repetition_penalty != 1.0 or req.presence_penalty
                or req.frequency_penalty or req.logit_bias
                or req.allowed_fn is not None):
            # the FIRST sampled token is penalized too (over the prompt
            # history the scheduler just recorded for this slot)
            bias = self.logit_bias[slot]
            row = self._constraint_row(req)
            if row is not None:
                bias = bias + row
            last = apply_logit_penalties(last, {
                "counts": jnp.asarray(self.token_counts[slot][None]),
                "rep": jnp.asarray([req.repetition_penalty], jnp.float32),
                "presence": jnp.asarray([req.presence_penalty], jnp.float32),
                "freq": jnp.asarray([req.frequency_penalty], jnp.float32),
                "bias": jnp.asarray(bias[None]),
            })
        if (req.temperature is not None or req.top_p is not None
                or req.top_k or req.min_p):
            one = lambda v, d: jnp.asarray([d if v is None else v], jnp.float32)
            first = sample_tokens_per_slot(
                last, sub,
                one(req.temperature, self.temperature),
                one(req.top_p, self.top_p),
                jnp.asarray([req.top_k], jnp.int32),
                jnp.asarray([req.min_p], jnp.float32),
            )
        else:
            first = sample_tokens(
                last, sub, temperature=self.temperature, top_p=self.top_p
            )
        req.logprobs.append(float(token_logprobs(raw, first)[0]))
        return int(first[0])

    def _step(self):
        self._key, sub = jax.random.split(self._key)
        lora = None
        if self.max_loras:
            lora = (self.lora_A, self.lora_B, jnp.asarray(self.slot_lora))
        sampling = None
        if self._per_slot_sampling:
            sampling = {
                "temperature": jnp.asarray(self.slot_temp),
                "top_p": jnp.asarray(self.slot_top_p),
                "top_k": jnp.asarray(self.slot_top_k),
                "min_p": jnp.asarray(self.slot_min_p),
            }
        penalties = None
        if self._per_slot_penalties:
            penalties = {
                "counts": jnp.asarray(self.token_counts),
                "rep": jnp.asarray(self.slot_rep),
                "presence": jnp.asarray(self.slot_presence),
                "freq": jnp.asarray(self.slot_freq),
                "bias": jnp.asarray(self._bias_with_constraints()),
            }
        engine = "xla" if self.mesh is not None else _decode_engine()
        burst = self._burst_steps()
        if burst > 1:
            tokens, lps, self.pools_k, self.pools_v = paged_decode_burst(
                self._decode_params, self.pools_k, self.pools_v,
                jnp.asarray(self.page_tables), jnp.asarray(self.positions),
                jnp.asarray(self.last_tokens), sub,
                self.cfg, self.page_size, burst, self.temperature,
                self.top_p, engine=engine, lora=lora, sampling=sampling,
                penalties=penalties,
            )
        else:
            tokens, lps, self.pools_k, self.pools_v = paged_decode_step(
                self._decode_params, self.pools_k, self.pools_v,
                jnp.asarray(self.page_tables), jnp.asarray(self.positions),
                jnp.asarray(self.last_tokens), sub,
                self.cfg, self.page_size, self.temperature, self.top_p,
                engine=engine, lora=lora, sampling=sampling,
                penalties=penalties,
            )
            tokens, lps = tokens[None], lps[None]  # (1, B)
        tokens = np.asarray(tokens)  # (steps, B)
        lps = np.asarray(lps)
        for slot in range(self.B):
            rid = self.slot_req[slot]
            if rid is None or slot in self._prefill_state:
                continue  # mid-prefill slots decode against trash pages;
                #           their sampled token is garbage by construction
            req = self.requests[rid]
            for i in range(tokens.shape[0]):
                tok = int(tokens[i, slot])
                req.tokens.append(tok)
                req.logprobs.append(float(lps[i, slot]))
                self.token_counts[slot, tok] += 1
                self.positions[slot] += 1
                self.last_tokens[slot] = tok
                if self.cfg.attention_window is not None:
                    self._free_behind_window(slot)
                if self._finished(req, tok):
                    # burst tail past the finish is discarded: the device
                    # over-decoded into pages this slot already owned, and
                    # the next occupant prefills its own content over them
                    self._release(slot)
                    break

    def _burst_steps(self) -> int:
        """Steps for this dispatch: `decode_burst` when bursting is legal —
        no prefill mid-flight (chunked prefills advance per scheduler
        iteration), no grammar-constrained slot (allowed_fn needs per-token
        host callbacks), and every active slot has at least `decode_burst`
        tokens left (no wasted tail work); else 1.  The burst length is a
        static jit arg, so only self.decode_burst and 1 ever compile."""
        k = self.decode_burst
        if k <= 1 or self._prefill_state:
            return 1
        for slot in range(self.B):
            rid = self.slot_req[slot]
            if rid is None:
                continue
            req = self.requests[rid]
            if req.allowed_fn is not None:
                return 1
            if req.max_new - len(req.tokens) < k:
                return 1
        return k

    def _free_behind_window(self, slot: int):
        """Sliding window: pages whose every slot fell below the window are
        recycled NOW, bounding a sequence's footprint at
        ceil(window/page)+1 pages regardless of length."""
        w = self.cfg.attention_window
        pos = int(self.positions[slot])
        ps = self.page_size
        pages = self.slot_pages[slot]
        pi = self.slot_watermark[slot]
        # page pi is dead when its last slot < pos - w + 1
        while (pi + 1) * ps <= pos - w + 1 and pi < len(pages):
            page = pages[pi]
            if page != self.trash_page:
                self._decref(page)
                pages[pi] = self.trash_page
                self.page_tables[slot, pi] = self.trash_page
            pi += 1
        self.slot_watermark[slot] = pi

    def _finished(self, req: Request, tok: int) -> bool:
        if len(req.tokens) >= req.max_new:
            return True
        eos = self.eos if req.eos is None else req.eos
        if eos is not None and tok == eos:
            return True
        for s in req.stop:
            if len(req.tokens) >= len(s) and tuple(req.tokens[-len(s):]) == s:
                return True
        return False

    def _release(self, slot: int):
        rid = self.slot_req[slot]
        self.requests[rid].done = True
        self.requests[rid].finished_at = time.perf_counter()
        for page in self.slot_pages[slot]:
            if page != self.trash_page:  # windowed slots hold trash markers
                self._decref(page)  # cached pages survive on the cache's ref
        self.slot_watermark[slot] = 0
        self.slot_req[slot] = None
        self.slot_pages[slot] = []
        self.slot_lora[slot] = 0
        self.page_tables[slot] = self.trash_page
