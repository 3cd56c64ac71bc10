"""Benchmark driver: bf16 GEMM TFLOPs/chip (headline) + attention fwd/bwd.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "details": {...}}

vs_baseline = measured TFLOP/s / (0.9 * chip bf16 roofline) per the
BASELINE.json target ("bf16 GEMM >= 90% of MXU roofline"): >= 1.0 means met.

Timing method: the TPU is reached through a relayed dispatch path with
~25 ms round-trip latency and an unreliable block_until_ready, so kernels
are timed as the SLOPE between two chained-iteration counts inside single
jit calls, with a device->host fetch as the sync point and min-of-runs to
reject RTT spikes.  This is the same discipline as the reference's
cudaEvent profiling mode (launcher_cuda.h:336-349), adapted to a remote
runtime.
"""

import json
import os
import sys
import time

import jax

# persistent compile cache: chained benchmark programs compile once per
# machine, not once per run (remote TPU compiles are expensive)
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def _timed(fn, *args, iters=8):
    _sync(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def slope_time(make_chain, k1=8, k2=32, iters=5, label="", reps=3):
    """Per-iteration time from two chain lengths, robust to relay
    congestion: the slope is computed from the GLOBAL MINIMUM time of each
    endpoint across all reps.  Per-rep slopes mislead when one endpoint's
    best-of-iters lands in a congested stretch (observed: a K=8 gemm
    endpoint drifting 39->52 ms across reps while K=40 held 63 ms, giving
    an impossible 274 TFLOP/s "median" slope); the minima both approximate
    the uncongested relay floor + compute, so the floor cancels."""
    f1, f2 = make_chain(k1), make_chain(k2)
    t1s, t2s = [], []
    for r in range(reps):
        t1 = _timed(f1, iters=iters)
        t2 = _timed(f2, iters=iters)
        t1s.append(t1)
        t2s.append(t2)
        _log(f"{label}[{r}]: K={k1} {t1*1e3:.1f} ms, K={k2} {t2*1e3:.1f} ms -> "
             f"{(t2-t1)/(k2-k1)*1e3:.3f} ms/iter")
    slope = max((min(t2s) - min(t1s)) / (k2 - k1), 1e-9)
    _log(f"{label}: min-based slope {slope*1e3:.3f} ms/iter")
    return slope


def bench_gemm(m=4096, k=4096, n=4096, dtype=jnp.bfloat16):
    from kfunca_tpu.ops.pallas_kernels.matmul import matmul

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), dtype)
    b = jax.random.normal(key, (k, n), dtype)

    # NOTE: operands must be ARGUMENTS, not closure captures — captured
    # arrays become program constants, and 32 MB of constants per program
    # makes the (remote) compile pathologically slow.
    def chain_pallas(K):
        @jax.jit
        def f(x, y):
            for _ in range(K):
                x = matmul(x, y)
            return x
        return lambda: f(a, b)

    def chain_xla(K):
        @jax.jit
        def f(x, y):
            for _ in range(K):
                x = jnp.matmul(x, y, preferred_element_type=jnp.float32).astype(dtype)
            return x
        return lambda: f(a, b)

    dt_p = slope_time(chain_pallas, k1=8, k2=104, label='gemm-pallas')
    dt_x = slope_time(chain_xla, k1=8, k2=104, label='gemm-xla')
    # seed the per-chip autotune cache with the blocks this run measured
    # (runtime/autotune.py; matmul_2d consults it before the swept defaults)
    from kfunca_tpu.runtime.autotune import record, shape_bucket
    record("gemm", shape_bucket(m, k, n), jnp.dtype(dtype),
           {"bm": 2048, "bn": 512, "bk": 2048})
    flops = 2 * m * k * n
    return flops / dt_p / 1e12, flops / dt_x / 1e12


def bench_attention(b=4, h=16, s=2048, d=128, dtype=jnp.bfloat16):
    from kfunca_tpu.ops.attention import causal_attention_fn

    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (b, h, s, d), dtype)
    k = jax.random.normal(key, (b, h, s, d), dtype)
    v = jax.random.normal(key, (b, h, s, d), dtype)
    g = jax.random.normal(key, (b, h, s, d), dtype)

    def chain_fwd(K):
        @jax.jit
        def f(x, kk, vv):
            for _ in range(K):
                x = causal_attention_fn(x, kk, vv)
            return x
        return lambda: f(q, k, v)

    def chain_fwd_bwd(K):
        @jax.jit
        def f(x, kk, vv, gg):
            for _ in range(K):
                out, vjp = jax.vjp(causal_attention_fn, x, kk, vv)
                dq, dk, dv = vjp(gg)
                # consume ALL grads: with `x = dq` alone XLA dead-code-
                # eliminates the dk/dv kernel and the chain measures only
                # fwd + the dq pass (burned round 1-2: inflated numbers)
                bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0]) > jnp.float32(1e30)).astype(x.dtype)
                x = dq + bump
            return x
        return lambda: f(q, k, v, g)

    dt_fwd = slope_time(chain_fwd, k1=8, k2=72, label='attn-fwd')
    dt_fb = slope_time(chain_fwd_bwd, k1=2, k2=14, label='attn-fwd-bwd')
    # seed the autotune cache with the measured production tile choices
    # (post in-kernel-stats rework re-sweep, tools_attnbwd2.py x3 runs:
    # bwd (512, 1024) wins at s=2048 — 96-98 TFLOP/s vs 92.7 at 512^2 and
    # 89.9 at 1024^2; fwd stays 512^2)
    from kfunca_tpu.runtime.autotune import record, shape_bucket
    record("attn_fwd", shape_bucket(s, s, d), jnp.dtype(dtype), {"bq": 512, "bk": 512})
    record("attn_bwd", shape_bucket(s, s, d), jnp.dtype(dtype), {"bq": 512, "bk": 1024})
    fwd_flops = 0.5 * 4 * b * h * s * s * d  # causal halves the work
    return fwd_flops / dt_fwd / 1e12, (fwd_flops * 3.5) / dt_fb / 1e12, dt_fwd, dt_fb


def bench_attention_headline():
    """Driver-visible long-context / GQA / splash-delta rows (VERDICT r4
    #4b) plus the s=32k block-capped forward row (#9).  The s=2048 MHA row
    stays in bench_attention; these are the cells where the kernel's causal
    block-skip geometry and the fused single-kernel backward show their
    margin (docs/ATTENTION_CEILING.md r4 table)."""
    from kfunca_tpu.ops.attention import causal_attention_fn

    out = {}

    def fb_chain(q, k, v, g):
        def mk(K):
            @jax.jit
            def f(x, kk, vv, gg):
                for _ in range(K):
                    o, vjp = jax.vjp(causal_attention_fn, x, kk, vv)
                    dq, dk, dv = vjp(gg)
                    bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0])
                            > jnp.float32(1e30)).astype(x.dtype)
                    x = dq + bump
                return x
            return lambda: f(q, k, v, g)
        return mk

    key = jax.random.PRNGKey(1)
    for label, (b, h, hkv, s) in {
        "s8192": (1, 16, 16, 8192),
        "s8192_gqa16to2": (1, 16, 2, 8192),
        "s2048_gqa16to2": (4, 16, 2, 2048),
    }.items():
        q = jax.random.normal(key, (b, h, s, 128), jnp.bfloat16)
        k = jax.random.normal(key, (b, hkv, s, 128), jnp.bfloat16)
        v = jax.random.normal(key, (b, hkv, s, 128), jnp.bfloat16)
        g = jax.random.normal(key, (b, h, s, 128), jnp.bfloat16)
        fl = 0.5 * 4 * b * h * s * s * 128 * 3.5
        dt = slope_time(fb_chain(q, k, v, g), k1=2, k2=8,
                        label=f"attn-{label}", reps=2)
        out[f"attn_{label}_fwd_bwd_tflops"] = round(fl / dt / 1e12, 1)

    # splash attention (production JAX TPU kernel) fwd+bwd on the SAME
    # s=2048 MHA cell as the headline attn_fwd_bwd_tflops row, same
    # process — the external baseline the shipped kernel beats
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk_,
            splash_attention_mask as sm_,
        )
        b, h, s, d = 4, 16, 2048, 128
        mask = sm_.MultiHeadMask([sm_.CausalMask((s, s)) for _ in range(h)])
        bs = sk_.BlockSizes(
            block_q=512, block_kv=1024, block_kv_compute=1024,
            block_q_dkv=512, block_kv_dkv=1024, block_kv_dkv_compute=1024,
            block_q_dq=512, block_kv_dq=1024,
        )
        splash = sk_.make_splash_mha(
            mask=mask, head_shards=1, q_seq_shards=1, block_sizes=bs)
        q = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
        g = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)

        def call(x, kk, vv):
            return jax.vmap(splash)(x, kk, vv)

        def mk(K):
            @jax.jit
            def f(x, kk, vv, gg):
                for _ in range(K):
                    o, vjp = jax.vjp(call, x, kk, vv)
                    dq, dk, dv = vjp(gg)
                    bump = ((dk[0, 0, 0, 0] + dv[0, 0, 0, 0])
                            > jnp.float32(1e30)).astype(x.dtype)
                    x = (dq + bump).astype(x.dtype)
                return x
            # splash traces f64 constants under jax_enable_x64 and Mosaic
            # dies converting them — run with x64 off (trace-level toggle)
            def run():
                with jax.enable_x64(False):
                    return f(q, k, v, g)
            return run
        fl = 0.5 * 4 * b * h * s * s * d * 3.5
        dt = slope_time(mk, k1=2, k2=8, label="attn-splash-s2048", reps=2)
        out["splash_s2048_fwd_bwd_tflops"] = round(fl / dt / 1e12, 1)
    except Exception as e:  # noqa: BLE001 - external-baseline row is best-effort
        _log(f"splash baseline row skipped: {e!r}")

    # s=32k forward: the VMEM block-picker's cap territory (shape-extremes
    # tier; backward at 32k is a slow-tier test, not a bench row)
    b, h, s, d = 1, 4, 32768, 128
    q = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)

    def mk32(K):
        @jax.jit
        def f(x, kk, vv):
            for _ in range(K):
                x = causal_attention_fn(x, kk, vv)
            return x
        return lambda: f(q, k, v)
    fl = 0.5 * 4 * b * h * s * s * d
    dt = slope_time(mk32, k1=2, k2=8, label="attn-s32k-fwd", reps=2)
    out["attn_s32k_fwd_tflops"] = round(fl / dt / 1e12, 1)
    return out


def bench_eager_dispatch(n=256, iters=400):
    """Eager dispatch cost: median us per op for the fused single-program
    dispatch (core/dispatch.py).  The reference's analog is
    TensorIterator::build + one launch per op call.

    READ WITH CARE on the relayed TPU: the fire-and-forget loop saturates
    the in-flight dispatch queue, so these numbers measure sustained
    RELAY+DEVICE throughput, which swings 70-400 us/op with relay weather
    (r3 windows).  The stable decomposition, measured isolated on a quiet
    relay with interleaved loops: bare jit(x+y) 16 us/op, kfunca a+b 70
    us/op => the framework's own host overhead is ~54 us/op.  floor_0arg /
    floor_2arg below give this run's in-window baselines."""
    import kfunca_tpu as kfunca

    a = kfunca.from_numpy(np.random.rand(n, n).astype(np.float32), 0)
    b = kfunca.from_numpy(np.random.rand(n, n).astype(np.float32), 0)
    # dispatch FLOOR: a 0-arg jitted program launched the same way eager ops
    # are — everything above this is host-side framework cost, everything in
    # it is jax dispatch + relay.  binary_fresh - floor = our own overhead.
    floor_prog = jax.jit(lambda: jnp.zeros((4,), jnp.float32))
    # 2-arg jax-only baseline: what a bare jit(x+y) costs with on-device
    # operands — (binary_fresh - floor_2arg) is the framework's own
    # dispatch overhead (view planning, program-key build, tensor wrap)
    two_arg = jax.jit(lambda x, y: x + y)
    xa = jnp.asarray(np.random.rand(n, n).astype(np.float32))
    yb = jnp.asarray(np.random.rand(n, n).astype(np.float32))
    results = {}
    varying = iter(np.linspace(0.5, 1.5, 100000).tolist())
    for label, fn in [
        ("floor_0arg", lambda: floor_prog()),
        ("floor_2arg", lambda: two_arg(xa, yb)),
        ("binary_fresh", lambda: a + b),
        ("binary_inplace", lambda: a.__iadd__(b)),
        ("scalar_mul", lambda: a * 2.0),
        ("scalar_mul_varying", lambda: a * next(varying)),
        ("fill", lambda: a.fill_(1.0)),
    ]:
        for _ in range(10):
            fn()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                fn()
            times.append((time.perf_counter() - t0) / iters * 1e6)
        times.sort()
        results[label] = round(times[len(times) // 2], 1)
        _log(f"eager {label}: {results[label]} us/op")
    # overhead-over-floor: the framework's own host cost, which is the
    # window-invariant quantity (absolute us/op swings 70-400 with relay
    # weather; the floors swing WITH it, so the delta is comparable
    # across rounds — r4 floor_2arg 25.8 vs r5 windows at ~39)
    results["binary_minus_floor2"] = round(
        results["binary_fresh"] - results["floor_2arg"], 1)
    results["scalar_minus_floor2"] = round(
        results["scalar_mul"] - results["floor_2arg"], 1)
    return results


def bench_elementwise_engines(shape=(4096, 4096), dtype=jnp.float32):
    """A/B the XLA vs Pallas elementwise engines on a chained contiguous
    add.  Reports ms per chained op: XLA FUSES the whole chain into one
    pass (its marginal per-op cost is near zero), which is precisely why
    it is the default engine; the Pallas kernel is opaque to fusion and
    pays full HBM traffic per op."""
    from kfunca_tpu.ops.pallas_kernels.elementwise import elementwise as pl_ew

    key = jax.random.PRNGKey(2)
    a = jax.random.normal(key, shape, dtype)
    b = jax.random.normal(key, shape, dtype)

    def chain_xla(K):
        @jax.jit
        def f(x, y):
            for _ in range(K):
                x = x + y
            return x
        return lambda: f(a, b)

    def chain_pallas(K):
        @jax.jit
        def f(x, y):
            for _ in range(K):
                x = pl_ew("add", x, y, acc_dt=jnp.float32, out_dt=dtype)
            return x
        return lambda: f(a, b)

    dt_x = slope_time(chain_xla, k1=8, k2=64, label="ew-xla", reps=2)
    dt_p = slope_time(chain_pallas, k1=8, k2=64, label="ew-pallas", reps=2)
    return dt_x * 1e3, dt_p * 1e3


def bench_reduce_engines():
    """A/B the TPU-default Pallas reduce + welford against XLA's reductions
    (VERDICT r2 weak #6: those defaults were dispatched without TPU
    evidence).  INTERLEAVED rounds (sequential phases drift 10-30%);
    ops/reduce.py's dispatch thresholds cite this section."""
    from kfunca_tpu.ops.pallas_kernels.reduce import reduce_2d
    from kfunca_tpu.ops.pallas_kernels.welford import welford_norm_stat

    key = jax.random.PRNGKey(5)
    # The sum operand must NOT fit in VMEM: round-3 used 4096^2 fp32
    # (64 MB) and XLA kept it VMEM-resident across the chain, so every
    # arm measured near-zero marginal cost ("sum-xla: 0.0" in BENCH_r03 —
    # physically impossible as HBM traffic, entirely possible as VMEM
    # re-reads).  16384^2 fp32 = 1 GB forces real HBM traffic
    # (tools_r4_reduce_fix.py postmortem).
    A = jax.random.normal(key, (16384, 16384), jnp.float32)
    B = jax.random.normal(key, (16387, 16387), jnp.float32)

    # NB the iteration dependency must be NON-LINEAR in x (`x = x + bump`
    # lets XLA rewrite sum(x + c) = sum(x) + n*c and collapse the whole
    # chain) AND the bump must consume the FULL intermediate output: a
    # scalar bump from r[0, 0] lets XLA slice intermediate reductions down
    # to column 0 (round-3 session 3: the int8 probe's "1970 TFLOP/s bf16"
    # was exactly the cost of reading one operand — every intermediate dot
    # had been narrowed to one output element).  The fix folds the FULL
    # (1, n) result into a maximum() over x's row 0 ONLY: every element of
    # the result is consumed (unsliceable), each iteration's input differs
    # (un-CSE-able), and the in-place row write is cheap — a broadcast
    # maximum over all of x would cost a 2x-footprint VPU pass per
    # iteration and mask the engine difference being measured.  Pallas
    # kernels are opaque custom calls, so the dependency stays symmetric.
    def chain_sum(engine, K):
        @jax.jit
        def f(x):
            r = None
            for _ in range(K):
                if engine == "pallas":
                    r = reduce_2d(x, op="sum", out_dt=jnp.float32)
                else:
                    r = jnp.sum(x, axis=0, keepdims=True)
                x = x.at[0:1, :].set(jnp.maximum(x[0:1, :], r - jnp.float32(3e38)))
            return r
        return lambda: f(A)

    def chain_norm(engine, K):
        @jax.jit
        def f(x):
            inv = None
            for _ in range(K):
                if engine == "pallas":
                    m_, inv = welford_norm_stat(x)
                else:
                    m_ = jnp.mean(x, axis=0, keepdims=True)
                    var = jnp.mean((x - m_) * (x - m_), axis=0, keepdims=True)
                    inv = 1.0 / jnp.sqrt(var + 1e-12)
                x = x.at[0:1, :].set(jnp.maximum(x[0:1, :], inv - jnp.float32(3e38)))
            return inv
        return lambda: f(B)

    cases = {
        "sum-pallas": (chain_sum("pallas", 8), chain_sum("pallas", 40), 32),
        "sum-xla": (chain_sum("xla", 8), chain_sum("xla", 40), 32),
        "normstat-pallas": (chain_norm("pallas", 2), chain_norm("pallas", 8), 6),
        "normstat-xla": (chain_norm("xla", 2), chain_norm("xla", 8), 6),
    }
    samples = {k: [] for k in cases}
    for r in range(3):
        for label, (f1, f2, span) in cases.items():
            t1, t2 = _timed(f1, iters=4), _timed(f2, iters=4)
            dt = max((t2 - t1) / span, 1e-9)
            samples[label].append(dt)
            _log(f"{label}[{r}]: {dt*1e3:.3f} ms/iter")
    results = {}
    for label, xs in samples.items():
        xs.sort()
        results[label] = round(xs[len(xs) // 2] * 1e3, 4)
    return results


def bench_int8_gemm(m=4096, k=4096, n=4096):
    """int8 quantized GEMM rate (2x MXU roofline: 394 TFLOP/s on v5e)."""
    from kfunca_tpu.ops.quant import matmul_q8, quantize_cols, quantize_rows

    key = jax.random.PRNGKey(3)
    af = jax.random.normal(key, (m, k), jnp.bfloat16)
    bf = jax.random.normal(key, (k, n), jnp.bfloat16)
    aq, asc = quantize_rows(af)
    bq, bsc = quantize_cols(bf)

    from kfunca_tpu.ops.quant import matmul_q8_xla

    def chain(blocks):
        def mk(K):
            @jax.jit
            def f(x, y, sa, sb):
                out = None
                for _ in range(K):
                    if blocks is None:  # dispatched default: XLA int8 dot
                        out = matmul_q8_xla(x, y, sa, sb, out_dtype=jnp.bfloat16)
                    else:
                        out = matmul_q8(x, y, sa, sb, out_dtype=jnp.bfloat16, **blocks)
                    # collapse-proof dependency: consume out ELEMENTWISE
                    # as the next operand (m=k=n).  A scalar out[0, 0]
                    # bump lets XLA slice intermediate XLA dots to one
                    # element (the Pallas custom call is opaque, so only
                    # the XLA arm was inflated); a full max-reduce bump is
                    # honest but pays a serialized VPU pass per iteration
                    # (MXU and VPU serialize).  The re-quantize clip fuses
                    # into the dot epilogue and is symmetric across arms.
                    x = jnp.clip(out, -127, 127).astype(jnp.int8)
                return out
            return lambda: f(aq, bq, asc, bsc)
        return mk

    # A/B the dispatched XLA path vs the Pallas kernel (its measured-best
    # blocks seed the autotune cache); headline = the dispatched path.
    # ROUND-INTERLEAVED (xla, pallas, xla, pallas...): phase-sequential
    # comparison drifts 10-30% with relay weather and once reversed a
    # verdict (round-3 session 2: sequential read 288 xla / 339 pallas)
    from kfunca_tpu.runtime.autotune import lookup, record, shape_bucket

    sbucket = shape_bucket(m, k, n)
    pallas_blocks = lookup("gemm_q8", sbucket, "int8") or {"bm": 512, "bn": 512, "bk": 4096}
    mk_x, mk_p = chain(None), chain(pallas_blocks)
    k1, k2 = 8, 104
    fx = (mk_x(k1), mk_x(k2))
    fp = (mk_p(k1), mk_p(k2))
    ts = {"xla": ([], []), "pallas": ([], [])}
    for r in range(3):
        for name, (f1, f2) in (("xla", fx), ("pallas", fp)):
            t1, t2 = _timed(f1, iters=5), _timed(f2, iters=5)
            ts[name][0].append(t1)
            ts[name][1].append(t2)
            _log(f"gemm-int8-{name}[{r}]: {(t2-t1)/(k2-k1)*1e3:.3f} ms/iter")
    # min-based endpoints (same congestion-robust estimator as slope_time)
    dt_xla = max((min(ts["xla"][1]) - min(ts["xla"][0])) / (k2 - k1), 1e-9)
    dt_pl = max((min(ts["pallas"][1]) - min(ts["pallas"][0])) / (k2 - k1), 1e-9)
    record("gemm_q8", sbucket, "int8", pallas_blocks)
    flops = 2 * m * k * n
    return flops / dt_xla / 1e12, flops / dt_pl / 1e12


def bench_serving(L=8, dm=1024, h=16, page=None, ctx=960, capacity=1024):
    """Decode throughput (tokens/s) for B=4/8 slots: the ragged paged-decode
    Pallas kernel vs the XLA gather path (VERDICT r2 weak #9).  K decode
    steps run inside ONE jit (lax.fori_loop), so the number measures the
    device decode step, not the relay round-trip the host scheduler pays.
    page=None consults the autotune cache like InferenceServer(page_size=
    None) does (v5e winner: 128 — 15x over 16 at context 2048)."""
    from jax import lax

    from kfunca_tpu.models.serve import paged_decode_step, quantize_decode_params
    from kfunca_tpu.models.transformer import TransformerConfig, init_params
    from kfunca_tpu.runtime import autotune as _at

    cfg = TransformerConfig(vocab_size=32000, d_model=dm, n_heads=h, n_layers=L,
                            d_ff=4 * dm, max_seq_len=2048)
    if page is None:
        hit = _at.lookup("decode_page", _at.shape_bucket(8, dm),
                         jnp.dtype(jnp.bfloat16))
        page = int(hit["page_size"]) if hit else 64
        _log(f"serving: page_size={page} ({'autotuned' if hit else 'default'})")
    max_pages = -(-capacity // page)
    params = init_params(jax.random.PRNGKey(7), cfg)
    qparams = quantize_decode_params(params)
    key = jax.random.PRNGKey(8)
    results = {}
    results["page_size"] = page
    for B in (4, 8):
        n_pages = B * max_pages + 1
        pools_k = jax.random.normal(key, (L, n_pages, page, h, dm // h), cfg.act_dtype)
        pools_v = jax.random.normal(key, (L, n_pages, page, h, dm // h), cfg.act_dtype)
        tables = np.full((B, max_pages), n_pages - 1, np.int32)
        for i in range(B):
            tables[i] = np.arange(i * max_pages, (i + 1) * max_pages, dtype=np.int32)
        tables = jnp.asarray(tables)
        positions0 = jnp.full((B,), ctx, jnp.int32)
        tokens0 = jnp.full((B,), 17, jnp.int32)

        from kfunca_tpu.ops.quant import quantize_vecs

        qpools_k = quantize_vecs(pools_k)  # (int8 pool, fp32 scales)
        qpools_v = quantize_vecs(pools_v)

        # fused [k | v] page rows + head-major scales: the production
        # single-chip layout (serve._paged_block fused path, pools_v=None)
        # driving the manual-DMA kernel — 87% of HBM roofline per page
        # read vs 35% for the BlockSpec kernel on split pools
        _rows = lambda a: a.reshape(L, n_pages, page, -1)
        pools_kv = jnp.concatenate([_rows(pools_k), _rows(pools_v)], axis=3)
        q8_kv = jnp.concatenate([_rows(qpools_k[0]), _rows(qpools_v[0])],
                                axis=3)
        q8_sc = jnp.concatenate([qpools_k[1], qpools_v[1]], axis=3)
        q8_sc = jnp.pad(  # slot-major lane-padded (L, N, page, 128) rows
            q8_sc, ((0, 0), (0, 0), (0, 0), (0, 128 - q8_sc.shape[3])))

        def chain(engine, q8=False, kv8=False):
            prm_in = qparams if q8 else params
            if engine == "pallas":  # fused layout, like InferenceServer
                pk_in = (q8_kv, q8_sc) if kv8 else pools_kv
                pv_in = None
            else:
                pk_in = qpools_k if kv8 else pools_k
                pv_in = qpools_v if kv8 else pools_v

            def mk(K):
                # params must be ARGUMENTS: closure-captured weights become
                # program constants and the serialized HLO blows past the
                # remote compiler's request-size limit (HTTP 413)
                @jax.jit
                def f(prm, pk, pv, pos, toks):
                    def body(_, carry):
                        pk, pv, pos, toks = carry
                        toks, _lp, pk, pv = paged_decode_step(
                            prm, pk, pv, tables, pos, toks, key, cfg, page,
                            0.0, 1.0, engine,
                        )
                        return (pk, pv, pos + 1, toks)
                    pk, pv, pos, toks = lax.fori_loop(0, K, body, (pk, pv, pos, toks))
                    return toks
                return lambda: f(prm_in, pk_in, pv_in, positions0, tokens0)
            return mk

        # HBM-roofline accounting per decode step (VERDICT r3 missing #5):
        # every step must read all matmul weights once (batch-amortized)
        # plus each slot's live KV pages; tokens/s_roofline = B / (bytes /
        # HBM_GBps) and the reported pct says how close the measured
        # number is to what the chip's bandwidth allows.
        hbm = 819e9  # v5e HBM GB/s (utils/device_info.py)
        wpar = 16 * dm * dm * L + dm * cfg.vocab_size  # blocks + tied head
        kv_pos = -(-ctx // page) * page  # pages touched (page granularity)
        kv_elems = kv_pos * L * h * (dm // h) * 2  # k+v, per slot
        for label, ch in (("pallas", chain("pallas")), ("xla", chain("xla")),
                          ("pallas_w8", chain("pallas", q8=True)),
                          ("pallas_w8kv8", chain("pallas", q8=True, kv8=True))):
            # reps=3: decode slopes swing ±30% with relay weather (the r5
            # page probe measured the SAME bf16 B8 config at 0.85-1.28
            # ms/step across windows); the min-based slope needs more
            # chances to catch an uncongested stretch
            dt = slope_time(ch, k1=4, k2=16, label=f"decode-{label}-B{B}", reps=3)
            wbytes = wpar * (1 if "w8" in label else 2)
            kvbytes = B * kv_elems * (1 if "kv8" in label else 2)
            roofline = B / ((wbytes + kvbytes) / hbm)
            tps = round(B / dt, 1)
            results[f"{label}_B{B}_tokens_per_s"] = tps
            results[f"{label}_B{B}_roofline_pct"] = round(100 * tps / roofline, 1)
            _log(f"decode {label} B{B}: {tps} tok/s = "
                 f"{results[f'{label}_B{B}_roofline_pct']}% of HBM roofline "
                 f"({roofline:.0f} tok/s @ {(wbytes + kvbytes) / 1e6:.0f} MB/step)")

    # prefill throughput: the full-prompt forward the engine's admission
    # pays per request (B=1, the scheduler prefills one request at a
    # time).  The chain threads cache and a logits-dependent bump through
    # each iteration so XLA cannot CSE the identical prefills.
    from kfunca_tpu.models.generate import forward_with_cache, init_kv_cache

    cache0 = init_kv_cache(cfg, 1, ctx + 64)
    ptoks = jax.random.randint(jax.random.PRNGKey(9), (1, ctx), 0,
                               cfg.vocab_size, jnp.int32)

    def chain_prefill(K):
        @jax.jit
        def f(prm, cache, t):
            def body(_, carry):
                cache, t = carry
                lg, cache = forward_with_cache(prm, t, cache, jnp.int32(0), cfg)
                bump = (lg[0, 0, 0] > jnp.float32(1e30)).astype(t.dtype)
                return cache, t + bump
            cache, t = lax.fori_loop(0, K, body, (cache, t))
            return t
        return lambda: f(params, cache0, ptoks)

    dt_pf = slope_time(chain_prefill, k1=2, k2=8, label="prefill", reps=2)
    results["prefill_tokens_per_s"] = round(ctx / dt_pf, 1)
    results["prefill_ctx"] = ctx
    # prefill MFU (VERDICT r4 missing #4 / next #8): prefill is
    # compute-bound.  FORWARD-ONLY accounting: 2*N FLOPs/token matmul
    # (N = matmul weights, embedding lookup excluded, tied head included
    # once) + 4*L*S*dm attention FLOPs/token (QK^T + AV, un-halved dense
    # convention to match train_mfu's "no causal discount").  NB the
    # first r5 run used the 6N fwd+bwd convention here and printed an
    # impossible 195% — prefill has no backward.
    n_par = 16 * dm * dm * L + dm * cfg.vocab_size
    pf_flops = 2 * n_par * ctx + 4 * L * ctx * ctx * dm
    results["prefill_tflops"] = round(pf_flops / dt_pf / 1e12, 1)
    results["prefill_mfu_pct"] = round(100 * pf_flops / dt_pf / 197e12, 1)
    return results


def bench_serving_e2e(L=8, dm=1024, h=16, page=128, n_requests=24,
                      quantized=False):
    """END-TO-END continuous-batching throughput (VERDICT r4 missing #2):
    drive InferenceServer itself — staggered arrivals, prefill+decode
    interleaved, prefix cache on, multi-step decode bursts — and report
    requests/s + the engine's own TTFT/TPOT latency stats.  Unlike
    bench_serving's kernel-level rows this number pays every real cost:
    host scheduling, relay dispatch, admission prefills, page bookkeeping.
    """
    import time as _time

    from kfunca_tpu.models.serve import InferenceServer
    from kfunca_tpu.models.transformer import TransformerConfig, init_params

    cfg = TransformerConfig(vocab_size=32000, d_model=dm, n_heads=h,
                            n_layers=L, d_ff=4 * dm, max_seq_len=2048)
    params = init_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(11)
    shared = rng.integers(1, cfg.vocab_size, size=2 * page).tolist()
    reqs = []
    for i in range(n_requests):
        if i % 2 == 0:  # half the requests share a 2-page prefix
            body = shared + rng.integers(
                1, cfg.vocab_size, size=int(rng.integers(32, 256))).tolist()
        else:
            body = rng.integers(
                1, cfg.vocab_size, size=int(rng.integers(64, 640))).tolist()
        reqs.append((body, int(rng.integers(24, 64))))

    def drive(srv):
        """Staggered arrivals: 8 upfront, then one more every 24 streamed
        tokens (keeps admissions interleaved with decode throughout)."""
        t0 = _time.perf_counter()
        ids = [srv.submit(p, max_new=m) for p, m in reqs[:8]]
        nxt, events = 8, 0
        for _rid, _tok, _lp, _fin in srv.stream():
            events += 1
            if nxt < n_requests and events % 24 == 0:
                ids.append(srv.submit(*reqs[nxt][:1], max_new=reqs[nxt][1]))
                nxt += 1
        while nxt < n_requests:  # stream drained early: submit the rest
            ids.append(srv.submit(reqs[nxt][0], max_new=reqs[nxt][1]))
            nxt += 1
            for _ in srv.stream():
                pass
        return _time.perf_counter() - t0

    def fresh_server():
        return InferenceServer(
            params, cfg, batch_slots=8, page_size=page, n_pages=96,
            max_pages_per_seq=8, prefix_cache=True, decode_burst=8,
            quantize_weights=quantized, quantize_kv=quantized,
        )

    # pass 1 warms the per-bucket prefill + burst-decode compiles (the
    # first r5 run measured ttft 231 s — all remote compile time); pass 2
    # on a FRESH server reuses the process-cached programs and is the
    # reported steady-state number
    drive(fresh_server())
    srv = fresh_server()
    dt = drive(srv)
    st = srv.throughput_stats()
    assert st["completed"] == n_requests, st
    out = {
        "requests_per_s": round(n_requests / dt, 2),
        "gen_tokens_per_s": round(st["generated_tokens"] / dt, 1),
        "mean_ttft_s": round(st["mean_ttft_s"], 4),
        "mean_tpot_s": round(st["mean_tpot_s"], 5),
        "prefix_hit_pages": st["prefix_hit_pages"],
        "n_requests": n_requests,
        "quantized": bool(quantized),
        "note": ("host-driven loop: every dispatch and per-burst token "
                 "fetch pays the ~25-50 ms axon relay RTT, which dominates "
                 "TPOT on this rig; the kernel-level decode rows above are "
                 "the device-side capability"),
    }
    _log(f"serving_e2e{' w8kv8' if quantized else ''}: "
         f"{out['requests_per_s']} req/s, {out['gen_tokens_per_s']} tok/s, "
         f"ttft {out['mean_ttft_s']}s, tpot {out['mean_tpot_s']}s")
    return out


def bench_train_mfu(dm=1024, L=12, h=8, ff=4096, B=8, S=2048, vocab=32000,
                    peak=197.0, remat=False, loss_chunk=4096,
                    state_dtype="float32", kv_heads=None, reps=3, k2=4):
    """End-to-end training-step MFU on one chip: full fwd+bwd+AdamW for a
    ~230M-param LM (SwiGLU blocks, bf16 activations / fp32 master
    params).  K steps chain inside ONE jit (params/opt-state feed forward,
    so the chain is inherently non-linear — AdamW's sqrt/divide cannot be
    reassociated away, and every output is consumed as the next carry).
    MFU uses the standard PaLM-style accounting: 6*N_matmul FLOPs/token
    plus 12*L*S*d_model attention FLOPs/token (no causal discount), over
    the chip's bf16 peak.  NB round <= 3 dropped the factor of L on the
    attention term (12*B*S^2*dm instead of 12*L*B*S^2*dm), undercounting
    the step's model FLOPs by ~16% at this shape — r3's "0.536" was
    0.640 under the correct formula; the r4 number is computed correctly
    and is NOT comparable to BENCH_r<=3 train_step.mfu values.  remat defaults OFF: this model's activations fit
    v5e HBM, and the same-process A/B measured remat at 331 ms/step vs
    282 without (the ~33% forward recompute -> 35.9% vs 42.2% MFU).
    loss_chunk=4096 (the chunked-vocab streamed LM head) measured ~4%
    faster than the materializing loss at this shape (272.0 vs 282.1
    ms/step, tools_losschunk.py interleaved A/B) and is the production
    default here; 8k/16k chunks were neutral.

    h=8 (head_dim 128) is the session-6 default: same d_model, SAME total
    FLOPs as h=16/hd64, but the flash kernels run ~2x more efficiently at
    d=128 (d=64 operands half-fill the 128-lane MXU tiles: measured 38-44
    vs 80-95 TFLOP/s).  Interleaved same-process A/B at L=6: 126.7 vs
    150.3 ms/step (+18.6%% tokens/s); full L=12 model: 221 ms/step,
    53.8%% MFU, 74.1k tok/s (vs 271/43.9%%/60.5k at hd64).  hd128 is also
    the modern architecture standard (Llama/Mistral); pass h=16 to
    measure the old shape."""
    from jax import lax

    from kfunca_tpu.models.train import OptConfig, init_opt_state, make_train_step
    from kfunca_tpu.models.transformer import TransformerConfig, init_params

    cfg = TransformerConfig(vocab_size=vocab, d_model=dm, n_heads=h,
                            n_layers=L, d_ff=ff, max_seq_len=S, remat=remat,
                            n_kv_heads=kv_heads)
    oc = OptConfig(lr=1e-4, weight_decay=0.1, state_dtype=state_dtype)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = init_opt_state(params, oc)
    step = make_train_step(cfg, oc, loss_chunk=loss_chunk)
    key = jax.random.PRNGKey(1)
    tokens = jax.random.randint(key, (B, S), 0, vocab, jnp.int32)
    targets = jnp.roll(tokens, -1, axis=1)

    # exact matmul-weight count (embedding lookup excluded; the tied lm-head
    # projection IS a matmul and is included via vocab*dm)
    n_mm = L * (dm * cfg.qkv_out + dm * dm + 3 * dm * ff) + dm * vocab
    # attention: QK^T + AV are 4*S*dm MACs = 8*S*dm FLOPs fwd per layer
    # per token-row => 12*L*S*dm per token fwd+bwd (PaLM App. B, no causal
    # discount — the convention counts the full score matrix)
    flops_per_step = 6 * n_mm * B * S + 12 * L * B * S * S * dm

    def mk(K):
        @jax.jit
        def f(p, o, t, tg):
            def body(_, carry):
                p, o = carry
                p, o, _loss = step(p, o, t, tg)
                return (p, o)
            p, o = lax.fori_loop(0, K, body, (p, o))
            # consume params + opt state (loop-carry structure already
            # forces iterations 1..K-1 to be fully computed; any final-
            # iteration DCE is a constant offset that cancels in the slope)
            return p["final_norm"][:1] + o["step"].astype(jnp.float32)
        return lambda: f(params, opt_state, tokens, targets)

    dt = slope_time(mk, k1=1, k2=k2, iters=3, label="train-step", reps=reps)
    mfu = flops_per_step / dt / 1e12 / peak
    return {
        "step_ms": round(dt * 1e3, 2),
        "mfu": round(mfu, 4),
        "tokens_per_s": round(B * S / dt, 1),
        "model": (f"L{L} d{dm} ff{ff} h{h} kv{kv_heads or h} B{B} S{S} "
                  f"remat={remat} opt_state={state_dtype} "
                  f"~{n_mm/1e6:.0f}M matmul params"),
    }


def bench_mamba_train(dm=512, L_layers=4, B=4, S=1024, vocab=8192):
    """Mamba-family training throughput on one chip: fwd+bwd+AdamW.  On
    TPU the selective scan dispatches the Pallas scan kernel (measured
    8.1x over the XLA chunked scan end-to-end: 21.4 vs 174 ms/step at
    this shape); the chunked XLA form (scan_chunk=128) is the fallback.
    Same K-step chained-loop slope methodology as bench_train_mfu."""
    from jax import lax

    from kfunca_tpu.models.mamba import MambaConfig, init_mamba_params, loss_fn
    from kfunca_tpu.models.train import OptConfig, apply_update, init_opt_state

    cfg = MambaConfig(vocab_size=vocab, d_model=dm, n_layers=L_layers,
                      d_state=16, dtype="bfloat16")
    oc = OptConfig(lr=1e-4, weight_decay=0.0)
    params = init_mamba_params(jax.random.PRNGKey(0), cfg)
    opt_state = init_opt_state(params, oc)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S), 2, vocab,
                                jnp.int32)
    targets = jnp.roll(tokens, -1, axis=1)

    def mk(K):
        @jax.jit
        def f(p, o, t, tg):
            def body(_, carry):
                p, o = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, t, tg, cfg)
                return apply_update(p, grads, o, oc)
            p, o = lax.fori_loop(0, K, body, (p, o))
            return p["final_norm"][:1] + o["step"].astype(jnp.float32)
        return lambda: f(params, opt_state, tokens, targets)

    dt = slope_time(mk, k1=1, k2=4, iters=3, label="mamba-train", reps=3)
    return {
        "step_ms": round(dt * 1e3, 2),
        "tokens_per_s": round(B * S / dt, 1),
        "model": f"mamba L{L_layers} d{dm} di{cfg.d_inner} N16 B{B} S{S} "
                 f"scan_chunk={cfg.scan_chunk}",
    }


def detect_peak_tflops():
    from kfunca_tpu.utils.device_info import _detect_peaks

    peak_tf, _ = _detect_peaks(jax.devices()[0])
    return peak_tf or 197.0  # default: v5e bf16 peak


def main():
    backend = jax.default_backend()
    if backend != "tpu":
        try:
            gemm_tflops, xla_tflops = bench_gemm(512, 512, 512, jnp.float32)
        except Exception as e:  # noqa: BLE001 - always emit the JSON line
            _log(f"no-TPU fallback gemm failed: {e!r}")
            gemm_tflops = xla_tflops = 0.0
        print(
            json.dumps(
                {
                    "metric": "bf16_gemm_tflops_per_chip",
                    "value": round(gemm_tflops, 3),
                    "unit": "TFLOP/s",
                    "vs_baseline": 0.0,
                    "details": {"backend": backend, "note": "no TPU available"},
                }
            )
        )
        return

    def section(label, fn, default):
        """One bench section; a failure degrades that section to its
        default instead of killing the whole round's artifact (the driver
        runs this once at round end — partial numbers beat none)."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - report-and-continue by design
            _log(f"bench section {label} FAILED: {e!r}")
            return default

    peak = detect_peak_tflops()
    gemm_tflops, xla_tflops = bench_gemm()  # headline: no fallback
    attn_fwd_tflops, attn_fb_tflops, dt_fwd, dt_fb = section(
        "attention", bench_attention, (0.0, 0.0, 0.0, 0.0))
    attn_headline = section("attention_headline", bench_attention_headline, {})
    int8_xla_tflops, int8_pallas_tflops = section(
        "int8_gemm", bench_int8_gemm, (0.0, 0.0))
    eager = section("eager_dispatch", bench_eager_dispatch, {})
    ew_xla_ms, ew_pallas_ms = section(
        "elementwise", bench_elementwise_engines, (0.0, 0.0))
    reduce_ab = section("reduce", bench_reduce_engines, {})
    serving = section("serving", bench_serving, {})
    train = section("train_mfu", lambda: bench_train_mfu(peak=peak), {})
    # bf16 optimizer moments: same model/shape, m+v stored bf16 (the r4
    # verdict's sanctioned state-traffic lever; docs/TRAINING.md)
    train_bf16s = section(
        "train_mfu_bf16state",
        lambda: bench_train_mfu(peak=peak, state_dtype="bfloat16", reps=2), {})
    # long-context row: S=8192 GQA(2 kv heads) + remat — where the flash
    # kernel's s>=8k rates (docs/ATTENTION_CEILING.md) show up end to end
    train_long = section(
        "train_long_s8192_gqa",
        lambda: bench_train_mfu(peak=peak, B=2, S=8192, kv_heads=2,
                                remat=True, reps=2, k2=3), {})
    mamba = section("mamba_train", bench_mamba_train, {})
    # serving_e2e LAST, alarm-timeboxed: its per-bucket prefill compiles
    # are the bench's slowest cold-cache path, and an r5 window saw its
    # quantized arm block >50 min on the relay — a wedge here must not
    # starve the sections above (SIGALRM can only fire between Python
    # bytecodes, but that is exactly where a blocked relay recv sits)
    import signal

    def timeboxed(label, fn, seconds=900):
        def run():
            def bang(sig, frm):
                raise TimeoutError(f"{label}: exceeded {seconds}s timebox")
            old = signal.signal(signal.SIGALRM, bang)
            signal.alarm(seconds)
            try:
                return fn()
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
        return section(label, run, {})

    serving_e2e = timeboxed("serving_e2e", bench_serving_e2e)
    serving_e2e_q = timeboxed(
        "serving_e2e_w8kv8", lambda: bench_serving_e2e(quantized=True))
    # kfunca_tpu.gemm dispatches XLA's dot by default (the vendor-library
    # path, mirroring the reference's CUTLASS call); the Pallas kernel is
    # the KFUNCA_GEMM_ENGINE=pallas alternative. Headline = dispatched.
    value = xla_tflops
    print(
        json.dumps(
            {
                "metric": "bf16_gemm_tflops_per_chip",
                "value": round(value, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(value / (0.9 * peak), 4),
                "details": {
                    "device": jax.devices()[0].device_kind,
                    "peak_bf16_tflops": peak,
                    "pallas_gemm_tflops": round(gemm_tflops, 2),
                    "xla_gemm_tflops": round(xla_tflops, 2),
                    "mxu_utilization": round(gemm_tflops / peak, 4),
                    "int8_gemm_tflops": round(int8_xla_tflops, 2),
                    "int8_gemm_pallas_tflops": round(int8_pallas_tflops, 2),
                    "attn_fwd_tflops": round(attn_fwd_tflops, 2),
                    "attn_fwd_bwd_tflops": round(attn_fb_tflops, 2),
                    "attn_fwd_ms": round(dt_fwd * 1e3, 3),
                    "attn_fwd_bwd_ms": round(dt_fb * 1e3, 3),
                    "attn_flops_convention": (
                        "causal-halved fwd (2bhssd), bwd = 2.5x fwd; rounds "
                        "1-2 used un-halved fwd on DCE-inflated chains - not "
                        "comparable (docs/ATTENTION_CEILING.md)"),
                    "attn_headline": attn_headline,
                    "gemm_shape": "4096x4096x4096 bf16",
                    "attn_shape": "b4 h16 s2048 d128 bf16 causal",
                    "eager_dispatch_us": eager,
                    "reduce_engine_ms": reduce_ab,
                    "decode_tokens_per_s": serving,
                    "serving_e2e": serving_e2e,
                    "serving_e2e_w8kv8": serving_e2e_q,
                    "train_step": train,
                    "train_step_bf16state": train_bf16s,
                    "train_long_s8192_gqa": train_long,
                    "mamba_train": mamba,
                    "elementwise_chained_ms_per_op": {
                        "xla": round(ew_xla_ms, 4),
                        "pallas": round(ew_pallas_ms, 4),
                        "note": "XLA fuses/collapses the chain (near-zero marginal cost) - the reason it is the default engine",
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
