"""int8 GEMM block sweep (VERDICT task 5: >=355 TFLOP/s of the 394 roofline).

At the round-2 blocks (512,512,4096) each grid step DMAs 4 MB for 5.4 us of
MXU work — bandwidth-bound.  Bigger output tiles raise arithmetic intensity
(int8 operands are 1 byte, so 1024/2048 tiles fit VMEM easily).

Interleaved rounds; numerics pinned vs the int64 oracle on small shapes by
tests/test_quant.py (not re-checked here).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as _np

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from kfunca_tpu.ops.quant import matmul_q8  # noqa: E402


def _sync(x):
    _np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def _timed(fn, iters=6):
    _sync(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    m = n = k = 4096
    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (m, k), -127, 128, jnp.int8)
    b = jax.random.randint(key, (k, n), -127, 128, jnp.int8)
    sa = jnp.ones((m,), jnp.float32)
    sb = jnp.ones((n,), jnp.float32)
    flops = 2.0 * m * n * k

    configs = [
        (512, 512, 4096),   # round-2 default (sweep-1 best median: 298)
        ("xla", None, None),       # XLA's own int8 dot + dequant epilogue
    ]

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from kfunca_tpu.ops.quant import _q8_kernel

    def q8_raw(x, y, bm=512, bn=512, bk=4096):
        # kernel without the dequant epilogue: i32 accumulator out
        def kern(a_ref, b_ref, o_ref, acc_ref):
            @pl.when(pl.program_id(2) == 0)
            def _init():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            acc_ref[:] += jax.lax.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)
            @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
            def _store():
                o_ref[:] = acc_ref[:]
        grid = (m // bm, n // bn, k // bk)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                      pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j))],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, y)

    def chain(bm, bn, bk, K):
        @jax.jit
        def f(x, y, ra, cb):
            out = None
            for _ in range(K):
                if bm == "xla":
                    acc = jax.lax.dot_general(
                        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
                    out = (acc.astype(jnp.float32) * ra[:, None] * cb[None, :]).astype(jnp.bfloat16)
                    bump = (out[0, 0] > jnp.bfloat16(1e30)).astype(jnp.int8)
                elif bm == "xla-raw":
                    acc = jax.lax.dot_general(
                        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
                    out = acc
                    bump = (acc[0, 0] > jnp.int32(2**30)).astype(jnp.int8)
                elif bm == "pallas-raw":
                    out = q8_raw(x, y)
                    bump = (out[0, 0] > jnp.int32(2**30)).astype(jnp.int8)
                else:
                    out = matmul_q8(x, y, ra, cb, bm=bm, bn=bn, bk=bk)
                    bump = (out[0, 0] > jnp.bfloat16(1e30)).astype(jnp.int8)
                # collapse-proof: x + bump lets XLA distribute the dot and
                # fold the chain (int8 "435 TFLOP/s" artifact); max() with
                # an always-smaller data-dependent value is irreducible
                x = jnp.maximum(x, bump + jnp.int8(-128))
            return out
        return lambda: f(a, b, sa, sb)

    k1, k2 = 8, 40
    chains = {c: (chain(*c, k1), chain(*c, k2)) for c in configs}
    results = {c: [] for c in configs}
    for r in range(5):
        for c, (f1, f2) in chains.items():
            t1, t2 = _timed(f1), _timed(f2)
            dt = max((t2 - t1) / (k2 - k1), 1e-9)
            tf = flops / dt / 1e12
            results[c].append(tf)
            print(f"[q8] r{r} {c}: {dt*1e3:.3f} ms -> {tf:.1f} TFLOP/s",
                  flush=True)
    print("[q8] === medians ===", flush=True)
    for c, tfs in results.items():
        tfs.sort()
        print(f"[q8] {c}: {tfs[len(tfs)//2]:.1f} TFLOP/s (all {[round(x) for x in tfs]})",
              flush=True)


if __name__ == "__main__":
    main()
