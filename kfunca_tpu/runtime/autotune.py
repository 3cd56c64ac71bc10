"""Per-chip kernel block-size autotuning cache (ROADMAP item 10).

The reference adapts launch geometry per GPU at runtime
(get_adaptive_config, /root/reference/src/device/utils/welford_norm.h:25-56);
the TPU analog is block-shape selection per (op, shape-class, dtype, chip):

  * a JSON cache persisted next to the compile cache (or
    KFUNCA_AUTOTUNE_CACHE) records the best-measured blocks per key;
  * `autotune_defaults.json` ships swept v5e entries as the checked-in
    baseline; the user cache overlays it;
  * bench.py SEEDS the cache: its interleaved block sweeps call record()
    with the winner, so the second run on the same chip starts from
    measured blocks instead of hard-coded constants;
  * kernels consult lookup() at dispatch/trace time — a later record()
    affects new compilations, not already-compiled programs (the same
    contract as every other static argument).
"""

from __future__ import annotations

import json
import os
import threading

import jax
import jax.numpy as jnp

_LOCK = threading.Lock()
_CACHE: dict | None = None
_DEFAULTS: dict | None = None


def chip_name() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "-")
    except Exception:
        return "unknown"


def cache_path() -> str:
    p = os.environ.get("KFUNCA_AUTOTUNE_CACHE")
    if p:
        return p
    d = jax.config.jax_compilation_cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(d, "kfunca_autotune.json")


def _load() -> None:
    global _CACHE, _DEFAULTS
    if _DEFAULTS is None:
        pkg = os.path.join(os.path.dirname(__file__), "autotune_defaults.json")
        try:
            with open(pkg) as f:
                _DEFAULTS = json.load(f)
        except Exception:
            _DEFAULTS = {}
    if _CACHE is None:
        try:
            with open(cache_path()) as f:
                _CACHE = json.load(f)
        except Exception:
            _CACHE = {}


def shape_bucket(*dims: int) -> str:
    """Power-of-two shape class: 4096x4000x4096 and 4096^3 share blocks."""
    out = []
    for d in dims:
        d = int(d)
        out.append(str(1 << max(0, (d - 1).bit_length())) if d > 0 else "0")
    return "x".join(out)


def _key(op: str, shape_class: str, dtype) -> str:
    return f"{chip_name()}|{op}|{shape_class}|{dtype}"


def lookup(op: str, shape_class: str, dtype) -> dict | None:
    """Best-known block params for this (chip, op, shape-class, dtype), or
    None.  The measured user cache overlays the shipped defaults."""
    with _LOCK:
        _load()
        k = _key(op, shape_class, str(dtype))
        hit = _CACHE.get(k)
        return dict(hit) if hit is not None else (
            dict(_DEFAULTS[k]) if k in _DEFAULTS else None
        )


def record(op: str, shape_class: str, dtype, params: dict) -> None:
    """Persist measured-best params (bench.py's sweeps call this)."""
    with _LOCK:
        _load()
        _CACHE[_key(op, shape_class, str(dtype))] = dict(params)
        p = cache_path()
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_CACHE, f, indent=1, sort_keys=True)
        os.replace(tmp, p)


# ---------------------------------------------------------------------------
# in-process sweep API: kfunca.autotune()  (ROADMAP item 9, round 3)
# ---------------------------------------------------------------------------
#
# Measurement discipline (docs + .claude/skills/verify: the TPU relay lies):
#  * per-iteration time is the SLOPE between two chained-iteration counts
#    inside single jit programs (dispatch latency cancels);
#  * candidates are INTERLEAVED round-robin and compared per round, then
#    medianed — sequential runs drift +-10-30% (thermal/relay);
#  * chain iterates feed the next step's operand, so XLA cannot dead-code-
#    eliminate any kernel, and operands are ARGUMENTS, not constants.


def _slope(make_chain, k1, k2, iters=4):
    import time

    import numpy as _np

    def sync(x):
        _np.asarray(jax.device_get(jnp.ravel(x)[:1]))

    f1, f2 = make_chain(k1), make_chain(k2)

    def timed(f):
        sync(f())  # compile + warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(f())
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(f2) - timed(f1)) / (k2 - k1), 1e-9)


def _gemm_chains(m, k, n, dtype, params):
    from ..ops.pallas_kernels.matmul import matmul

    interp = jax.default_backend() == "cpu"  # Pallas compiled path is TPU-only
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), dtype)
    b = jax.random.normal(key, (k, n), dtype)

    def make_chain(K):
        @jax.jit
        def f(x, y):
            for _ in range(K):
                x = matmul(x, y, interpret=interp, **params)
            return x

        return lambda: f(a, b)

    return make_chain, 2.0 * m * k * n


def _attn_chains(b, h, s, d, dtype, params, bwd):
    from ..ops.pallas_kernels.flash_attention import (
        flash_attention_backward, flash_attention_fwd_stats,
    )

    interp = jax.default_backend() == "cpu"
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (b, h, s, d), dtype)
    kk = jax.random.normal(key, (b, h, s, d), dtype)
    v = jax.random.normal(key, (b, h, s, d), dtype)
    g = jax.random.normal(key, (b, h, s, d), dtype)
    flops = 0.5 * 4 * b * h * s * s * d  # causal-halved accounting

    if not bwd:

        def make_chain(K):
            @jax.jit
            def f(x, k_, v_):
                for _ in range(K):
                    x, _ = flash_attention_fwd_stats(x, k_, v_, save_stats=False,
                                                     interpret=interp, **params)
                return x

            return lambda: f(q, kk, v)

        return make_chain, flops

    def make_chain(K):
        @jax.jit
        def f(x, k_, v_, g_):
            for _ in range(K):
                o, lse = flash_attention_fwd_stats(x, k_, v_, interpret=interp)
                dq, dk, dv = flash_attention_backward(x, k_, v_, g_, out=o,
                                                      lse=lse, interpret=interp,
                                                      **params)
                # consume EVERY output or XLA drops the dkv kernel
                bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0]) >
                        jnp.float32(1e30)).astype(x.dtype)
                x = dq + bump
            return x

        return lambda: f(q, kk, v, g)

    return make_chain, flops * 3.5


def _q8_chains(m, k, n, params):
    from ..ops.quant import matmul_q8, quantize_cols, quantize_rows

    interp = jax.default_backend() == "cpu"
    key = jax.random.PRNGKey(3)
    af = jax.random.normal(key, (m, k), jnp.bfloat16)
    bf = jax.random.normal(key, (k, n), jnp.bfloat16)
    aq, asc = quantize_rows(af)
    bq, bsc = quantize_cols(bf)

    def make_chain(K):
        @jax.jit
        def f(x, y, sa, sb):
            out = None
            for _ in range(K):
                out = matmul_q8(x, y, sa, sb, out_dtype=jnp.bfloat16,
                                interpret=interp, **params)
                # collapse-proof: maximum() against an always-smaller
                # data-dependent value (additive bumps fold through dots)
                bump = (out[0, 0] > jnp.bfloat16(3e4)).astype(jnp.int8)
                x = jnp.maximum(x, bump + jnp.int8(-128))
            return out

        return lambda: f(aq, bq, asc, bsc)

    return make_chain, 2.0 * m * k * n


def _reduce_chains(r, c, dtype, params, welford):
    from ..ops.pallas_kernels.reduce import reduce_2d
    from ..ops.pallas_kernels.welford import welford_norm_stat

    interp = jax.default_backend() == "cpu"
    x0 = jax.random.normal(jax.random.PRNGKey(4), (r, c), jnp.float32)

    def make_chain(K):
        @jax.jit
        def f(x):
            for _ in range(K):
                if welford:
                    mean, invstd = welford_norm_stat(x, interpret=interp, **params)
                    probe = mean[0] + invstd[0]
                else:
                    out = reduce_2d(x, op="sum", interpret=interp, **params)
                    probe = out[0, 0]
                # collapse-proof: maximum() against an always-smaller
                # data-dependent scalar (additive bumps reassociate away)
                x = jnp.maximum(x, probe * jnp.float32(1e-30) - jnp.float32(1e30))
            return x

        return lambda: f(x0)

    # "flops" here = reduction adds (welford ~3 VPU ops/elem); the
    # interesting unit is really bytes/s, but the comparison is relative
    return make_chain, float(r * c) * (3.0 if welford else 1.0)


def _decode_page_chains(b, hd_total, context, params):
    """Paged-decode serving kernel at a candidate page size: fixed context
    length per sequence, pools sized to cover it, all slots live."""
    from ..ops.pallas_kernels.paged_attention import paged_decode_attention

    interp = jax.default_backend() == "cpu"
    page = params["page_size"]
    h, hd = max(1, hd_total // 128), 128
    max_pages = -(-context // page)
    n_pages = b * max_pages + 1
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (b, h, hd), jnp.bfloat16)
    pool_k = jax.random.normal(key, (n_pages, page, h, hd), jnp.bfloat16)
    pool_v = jax.random.normal(key, (n_pages, page, h, hd), jnp.bfloat16)
    tables = jnp.arange(b * max_pages, dtype=jnp.int32).reshape(b, max_pages) + 1
    positions = jnp.full((b,), context - 1, jnp.int32)

    def make_chain(K):
        @jax.jit
        def f(x, pk, pv):
            for _ in range(K):
                out = paged_decode_attention(x, pk, pv, tables, positions,
                                             interpret=interp)
                x = jnp.maximum(x, out[0, 0, 0] * jnp.bfloat16(1e-30)
                                - jnp.bfloat16(1e30))
            return x

        return lambda: f(q, pool_k, pool_v)

    return make_chain, 4.0 * b * h * hd * context


_SWEEP_DEFAULTS = {
    "gemm": [
        {"bm": 2048, "bn": 512, "bk": 2048},
        {"bm": 1024, "bn": 512, "bk": 2048},
        {"bm": 2048, "bn": 1024, "bk": 1024},
        {"bm": 512, "bn": 512, "bk": 4096},
    ],
    "gemm_q8": [
        {"bm": 512, "bn": 512, "bk": 4096},
        {"bm": 256, "bn": 512, "bk": 4096},
        {"bm": 512, "bn": 512, "bk": 2048},
        {"bm": 1024, "bn": 512, "bk": 4096},
    ],
    "attn_fwd": [
        {"bq": 512, "bk": 512},
        {"bq": 1024, "bk": 512},
        {"bq": 512, "bk": 1024},
    ],
    "attn_bwd": [
        {"bq": 512, "bk": 512},
        {"bq": 256, "bk": 512},
        {"bq": 512, "bk": 1024},
        # wins at long context (s>=8k) post in-kernel-stats rework
        {"bq": 1024, "bk": 1024},
    ],
    # Pallas reduction substrate (XLA is the measured production default;
    # these tune the KFUNCA_REDUCE_ENGINE=pallas path)
    "reduce": [
        {"br": 512, "bc": 512},
        {"br": 256, "bc": 1024},
        {"br": 1024, "bc": 256},
        {"br": 512, "bc": 1024},
    ],
    "welford": [
        {"br": 512, "bc": 512},
        {"br": 256, "bc": 1024},
        {"br": 1024, "bc": 256},
        {"br": 512, "bc": 1024},
    ],
    # serving: KV page size for the paged-decode kernel (InferenceServer
    # consults the recorded winner when constructed with page_size=None)
    "decode_page": [
        {"page_size": 16},
        {"page_size": 32},
        {"page_size": 64},
        {"page_size": 128},
    ],
}


def autotune(op: str, *shape: int, dtype=None, candidates: list | None = None,
             reps: int = 3, k1: int = 4, k2: int = 16, verbose: bool = True):
    """Sweep kernel block candidates for `op` at `shape` ON THIS CHIP and
    persist the winner, so subsequent dispatches at this shape class use it.

        kfunca.autotune("gemm", 4096, 4096, 4096)          # m, k, n
        kfunca.autotune("attn_fwd", 4, 16, 2048, 128)      # b, h, s, d
        kfunca.autotune("attn_bwd", 4, 16, 2048, 128)
        kfunca.autotune("reduce", 16384, 16384)            # rows, cols (dim-0)
        kfunca.autotune("welford", 16387, 16387)
        kfunca.autotune("decode_page", 8, 2048, 2048)      # slots, H*hd, context

    Candidates are interleaved round-robin (relay/thermal drift makes
    sequential comparison meaningless) and per-iteration times come from
    chained-program slopes.  Returns {"params", "ms", "tflops", "all"}.
    """
    if op not in _SWEEP_DEFAULTS:
        raise ValueError(f"autotune: unknown op {op!r} "
                         f"(supported: {sorted(_SWEEP_DEFAULTS)})")
    dtype = jnp.bfloat16 if dtype is None else dtype
    cands = candidates or _SWEEP_DEFAULTS[op]
    if op == "gemm":
        m, k, n = shape
        built = [(_gemm_chains(m, k, n, dtype, c)) for c in cands]
        bucket = shape_bucket(m, k, n)
    elif op == "gemm_q8":
        m, k, n = shape
        dtype = "int8"  # cache key convention shared with ops/quant.py
        built = [(_q8_chains(m, k, n, c)) for c in cands]
        bucket = shape_bucket(m, k, n)
    elif op in ("attn_fwd", "attn_bwd"):
        b, h, s, d = shape
        built = [(_attn_chains(b, h, s, d, dtype, c, op == "attn_bwd"))
                 for c in cands]
        bucket = shape_bucket(s, s, d)
    elif op in ("reduce", "welford"):
        r, c = shape
        dtype = jnp.float32  # the Pallas reduction substrate is fp32-acc
        built = [(_reduce_chains(r, c, dtype, cand, op == "welford"))
                 for cand in cands]
        bucket = shape_bucket(r, c)
    elif op == "decode_page":
        b, hd_total, context = shape
        built = [(_decode_page_chains(b, hd_total, context, cand))
                 for cand in cands]
        bucket = shape_bucket(b, hd_total)
    else:  # pragma: no cover - guarded above
        raise AssertionError(op)

    times = [[] for _ in cands]
    for r in range(reps):
        for i, (mk, _fl) in enumerate(built):
            dt = _slope(mk, k1, k2)
            times[i].append(dt)
            if verbose:
                print(f"[autotune] {op} r{r} {cands[i]}: {dt*1e3:.3f} ms/iter",
                      flush=True)
    medians = [sorted(ts)[len(ts) // 2] for ts in times]
    best = min(range(len(cands)), key=lambda i: medians[i])
    flops = built[best][1]
    record(op, bucket, dtype if isinstance(dtype, str) else jnp.dtype(dtype),
           cands[best])
    result = {
        "params": dict(cands[best]),
        "ms": medians[best] * 1e3,
        "tflops": flops / medians[best] / 1e12,
        "all": [{"params": dict(c), "ms": mt * 1e3}
                for c, mt in zip(cands, medians)],
    }
    if verbose:
        print(f"[autotune] {op} {bucket} -> {result['params']} "
              f"({result['tflops']:.1f} TFLOP/s)", flush=True)
    return result
