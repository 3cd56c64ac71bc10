"""Bisect which construct in the manual-DMA decode kernel hangs the Mosaic
compile (r5: the full kernel compile never returns; the TPU itself stays
healthy).  Run one variant per process: `python tools_r5_dma_bisect.py N`.

Variants:
  0  static-trip fori, serial dma start+wait, no guards
  1  dynamic-trip fori (n_steps from a scalar), serial dma
  2  static-trip fori + pl.when-guarded start (the pipelining guard)
  3  dynamic-trip + pipelined depth-2 (warm loop + ahead guard)
  4  variant 3 + MXU dot in the body
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

PAGE, HKVHD, N, MAXP, B = 128, 1024, 33, 8, 4


def make(variant):
    def kernel(tables_ref, positions_ref, q_ref, kpool_ref, o_ref,
               kbuf, vbuf, acc_ref, sems, sems2):
        b = pl.program_id(0)
        pos = positions_ref[b]
        n_steps = jax.lax.div(pos, _np.int32(PAGE)) + _np.int32(1)
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def dma(i, slot):
            pid = tables_ref[b, i]
            return pltpu.make_async_copy(
                kpool_ref.at[pid], kbuf.at[slot], sems.at[slot])

        if variant == 0:
            def body(i, c):
                dma(i, jnp.asarray(0, jnp.int32)).start()
                dma(i, jnp.asarray(0, jnp.int32)).wait()
                acc_ref[:] += kbuf[0][0:16].astype(jnp.float32)
                return c
            jax.lax.fori_loop(jnp.asarray(0, jnp.int32),
                              jnp.asarray(MAXP, jnp.int32), body,
                              jnp.asarray(0, jnp.int32))
        elif variant == 1:
            def body(i, c):
                dma(i, jnp.asarray(0, jnp.int32)).start()
                dma(i, jnp.asarray(0, jnp.int32)).wait()
                acc_ref[:] += kbuf[0][0:16].astype(jnp.float32)
                return c
            jax.lax.fori_loop(jnp.asarray(0, jnp.int32), n_steps, body,
                              jnp.asarray(0, jnp.int32))
        elif variant == 2:
            def body(i, c):
                @pl.when(i < n_steps)
                def _():
                    dma(i, jnp.asarray(0, jnp.int32)).start()
                    dma(i, jnp.asarray(0, jnp.int32)).wait()
                acc_ref[:] += kbuf[0][0:16].astype(jnp.float32)
                return c
            jax.lax.fori_loop(jnp.asarray(0, jnp.int32),
                              jnp.asarray(MAXP, jnp.int32), body,
                              jnp.asarray(0, jnp.int32))
        elif variant in (3, 4, 5, 7):
            depth = 4 if variant == 7 else 2

            if variant in (5, 6, 7):
                # warm-up as a fori_loop (the full kernel's form)
                def warm(i, c):
                    @pl.when(i < n_steps)
                    def _():
                        dma(i, jax.lax.rem(i, _np.int32(depth))).start()
                    return c
                jax.lax.fori_loop(jnp.asarray(0, jnp.int32),
                                  jnp.asarray(depth - 1, jnp.int32), warm,
                                  jnp.asarray(0, jnp.int32))
            else:
                @pl.when(jnp.asarray(0, jnp.int32) < n_steps)
                def _():
                    dma(jnp.asarray(0, jnp.int32),
                        jnp.asarray(0, jnp.int32)).start()

            def body(i, c):
                slot = jax.lax.rem(i, _np.int32(depth))
                ahead = i + _np.int32(depth - 1)

                @pl.when(ahead < n_steps)
                def _():
                    dma(ahead, jax.lax.rem(ahead, _np.int32(depth))).start()
                dma(i, slot).wait()
                if variant == 4:
                    k = kbuf[slot].astype(jnp.bfloat16)
                    qm = q_ref[0].astype(jnp.bfloat16)  # (HKVHD, 16)
                    s = jax.lax.dot_general(
                        qm, k, (((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (16, page)
                    acc_ref[:] += jax.lax.dot_general(
                        s.astype(jnp.bfloat16), k,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)[:, :HKVHD]
                else:
                    acc_ref[:] += kbuf[slot][0:16].astype(jnp.float32)
                return c
            jax.lax.fori_loop(jnp.asarray(0, jnp.int32), n_steps, body,
                              jnp.asarray(0, jnp.int32))
        elif variant == 6:
            # two DMAs per step from the same pool into two buffers with a
            # 2-D semaphore array (the full kernel's k+v form)
            depth = 2

            def dma2(i, slot):
                pid = tables_ref[b, i]
                return [
                    pltpu.make_async_copy(kpool_ref.at[pid], kbuf.at[slot],
                                          sems2.at[slot, _np.int32(0)]),
                    pltpu.make_async_copy(kpool_ref.at[pid], vbuf.at[slot],
                                          sems2.at[slot, _np.int32(1)]),
                ]

            def warm(i, c):
                @pl.when(i < n_steps)
                def _():
                    for d in dma2(i, jax.lax.rem(i, _np.int32(depth))):
                        d.start()
                return c
            jax.lax.fori_loop(jnp.asarray(0, jnp.int32),
                              jnp.asarray(depth - 1, jnp.int32), warm,
                              jnp.asarray(0, jnp.int32))

            def body(i, c):
                slot = jax.lax.rem(i, _np.int32(depth))
                ahead = i + _np.int32(depth - 1)

                @pl.when(ahead < n_steps)
                def _():
                    for d in dma2(ahead, jax.lax.rem(ahead, _np.int32(depth))):
                        d.start()
                for d in dma2(i, slot):
                    d.wait()
                acc_ref[:] += (kbuf[slot][0:16].astype(jnp.float32)
                               + vbuf[slot][0:16].astype(jnp.float32))
                return c
            jax.lax.fori_loop(jnp.asarray(0, jnp.int32), n_steps, body,
                              jnp.asarray(0, jnp.int32))
        o_ref[0] = acc_ref[:16, :].astype(o_ref.dtype)

    depth = 4 if variant == 7 else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HKVHD, 16),
                         lambda b, t, p: (b, _np.int32(0), _np.int32(0))),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 16, HKVHD), lambda b, t, p: (b, _np.int32(0), _np.int32(0))),
        scratch_shapes=[
            pltpu.VMEM((depth, PAGE, HKVHD), jnp.bfloat16),
            pltpu.VMEM((depth, PAGE, HKVHD), jnp.bfloat16),
            pltpu.VMEM((16, HKVHD), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 16, HKVHD), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )


def main():
    variant = int(sys.argv[1])
    key = jax.random.PRNGKey(0)
    import numpy as np
    q = jax.random.normal(key, (B, HKVHD, 16), jnp.bfloat16)
    pool = jax.random.normal(key, (N, PAGE, HKVHD), jnp.bfloat16)
    tables = jnp.asarray(np.stack(
        [np.arange(i * MAXP, (i + 1) * MAXP, dtype=np.int32)
         for i in range(B)]))
    pos = jnp.asarray([17, 250, 700, 1023], jnp.int32)
    t0 = time.time()
    out = make(variant)(tables, pos, q, pool)
    out.block_until_ready()
    print(f"variant {variant}: OK in {time.time()-t0:.1f}s "
          f"sum={float(jnp.sum(out.astype(jnp.float32))):.3e}", flush=True)


if __name__ == "__main__":
    main()
