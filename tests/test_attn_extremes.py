"""Shape-extremes stress tier for the flash attention kernels (VERDICT r4
#9): the pad+mask contract where it is thinnest — very long sequences,
head dims off the 128 sweet spot (64 half-fills a lane tile, 256 spans
two), ragged S not a multiple of any tile, and B*H=1 (a single grid row,
no parallel dimension to hide indexing bugs behind).

Runs in the hermetic CPU tier via interpret mode; long-S cells use large
blocks to keep the unrolled interpret grid small (the production 512-row
blocks at s=32k are exercised on real hardware by bench.py's
attn_s32k_fwd_tflops row — same tables/mask code, different tiling).
Reference contract: /root/reference/src/device/utils/causal_attention.h
:113-207 handles only d in {64,128} and aligned S (naive fallback
otherwise); these cells are all beyond it.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.ops.pallas_kernels.flash_attention import (
    flash_attention_backward,
    flash_attention_fwd_stats,
)
from kfunca_tpu.utils.errors import KfError


def chunked_causal_oracle(q, k, v, chunk=1024):
    """Causal attention oracle computed in q-row chunks so the (Sq, Skv)
    score matrix never fully materializes (needed at s=32k: 4 GiB fp32)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    outs = []
    for c0 in range(0, sq, chunk):
        c1 = min(c0 + chunk, sq)
        s = jnp.einsum("bhqd,bhkd->bhqk", q[:, :, c0:c1], k) * scale
        row = jax.lax.broadcasted_iota(jnp.int32, (c1 - c0, skv), 0) + c0
        col = jax.lax.broadcasted_iota(jnp.int32, (c1 - c0, skv), 1)
        s = jnp.where(col <= row, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.einsum("bhqk,bhkd->bhqd", p, v))
    return jnp.concatenate(outs, axis=2)


def _mk(b, h, s, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), dtype)
    return mk(), mk(), mk()


@pytest.mark.slow
class TestLongSequence:
    def test_s32k_fwd_single_head(self):
        """B*H=1, S=32768, d=128: 8 q-tiles of 4096, full causal table."""
        q, k, v = _mk(1, 1, 32768, 128, seed=1)
        out, lse = jax.jit(
            lambda q, k, v: flash_attention_fwd_stats(
                q, k, v, bq=4096, bk=4096, interpret=True)
        )(q, k, v)
        ref = chunked_causal_oracle(q, k, v)
        assert np.allclose(np.asarray(out), np.asarray(ref),
                           atol=2e-3, rtol=2e-3)
        assert np.isfinite(np.asarray(lse)).all()

    def test_s8k_fwd_bwd_single_head(self):
        """Fused backward at S=8192, B*H=1, vs the oracle VJP."""
        q, k, v = _mk(1, 1, 8192, 128, seed=2)
        g = _mk(1, 1, 8192, 128, seed=3)[0]
        dq, dk, dv = flash_attention_backward(
            q, k, v, g, bq=2048, bk=2048, interpret=True)
        ref_out, vjp = jax.vjp(lambda a, b_, c: chunked_causal_oracle(
            a, b_, c, chunk=8192), q, k, v)
        rdq, rdk, rdv = vjp(g)
        for got, want in ((dq, rdq), (dk, rdk), (dv, rdv)):
            assert np.allclose(np.asarray(got), np.asarray(want),
                               atol=5e-3, rtol=5e-3)


@pytest.mark.slow
class TestHeadDimExtremes:
    @pytest.mark.parametrize("d", [64, 256])
    def test_ragged_s_fwd_bwd(self, d):
        """S=1000 (not a multiple of 128), B*H=1, d off the 128 tile:
        d=64 pads lanes to 128, d=256 spans two lane tiles; padded q rows
        and padded d lanes must contribute exactly zero to every grad."""
        s = 1000
        q, k, v = _mk(1, 1, s, d, seed=4)
        g = _mk(1, 1, s, d, seed=5)[0]
        out, _ = flash_attention_fwd_stats(q, k, v, bq=512, bk=512,
                                           interpret=True)
        ref_out, vjp = jax.vjp(chunked_causal_oracle, q, k, v)
        assert np.allclose(np.asarray(out), np.asarray(ref_out),
                           atol=1e-4, rtol=1e-4)
        dq, dk, dv = flash_attention_backward(q, k, v, g, bq=512, bk=512,
                                              interpret=True)
        rdq, rdk, rdv = vjp(g)
        for got, want in ((dq, rdq), (dk, rdk), (dv, rdv)):
            assert np.allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)

    def test_rect_ragged_bh1(self):
        """sq != skv, both ragged, single head: q=893 rows vs kv=1021."""
        rng = np.random.default_rng(6)
        q = jnp.asarray(rng.uniform(-1, 1, (1, 1, 893, 64)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (1, 1, 1021, 64)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (1, 1, 1021, 64)), jnp.float32)
        out, _ = flash_attention_fwd_stats(q, k, v, bq=512, bk=512,
                                           interpret=True)
        ref = chunked_causal_oracle(q, k, v)
        assert np.allclose(np.asarray(out), np.asarray(ref),
                           atol=1e-4, rtol=1e-4)


class TestVmemGuardRail:
    def test_backward_rejects_overbudget_sequence(self):
        """s=131072 d=128: the fused backward's whole-sequence dq/lse/delta
        scratch (~200 MiB) exceeds the 100 MiB budget — must raise the
        actionable KfError (common.py rails), not an opaque Mosaic
        allocation failure.  Shapes only; nothing is computed."""
        s = 131072
        q = jax.ShapeDtypeStruct((1, 1, s, 128), jnp.float32)
        with pytest.raises(KfError, match="VMEM working set"):
            jax.eval_shape(
                lambda a, b_, c, g_: flash_attention_backward(a, b_, c, g_),
                q, q, q, q)

    def test_s32k_d128_is_under_budget(self):
        """The documented s=32k d=128 cell FITS (the BENCH row's shape):
        eval_shape traces the whole kernel without tripping the rail."""
        s = 32768
        q = jax.ShapeDtypeStruct((1, 1, s, 128), jnp.float32)
        res = jax.eval_shape(
            lambda a, b_, c, g_: flash_attention_backward(a, b_, c, g_),
            q, q, q, q)
        assert res[0].shape == (1, 1, s, 128)
