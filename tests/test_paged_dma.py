"""Manual-DMA paged-decode kernel + fused serving pool layout.

The production single-chip decode path (round 5) is
`paged_decode_attention_dma` over ONE fused [k | v] page-row stack
(serve._paged_block fused layout, pools_v=None): one contiguous DMA per
page measured at 87% of HBM roofline vs 35% for the BlockSpec kernel
(tools_r5_decode_probe).  These tests pin the kernel to the BlockSpec
oracle in interpret mode and the fused server layout to the legacy split
layout token-for-token.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.serve import InferenceServer
from kfunca_tpu.models.transformer import TransformerConfig, init_params
from kfunca_tpu.ops.pallas_kernels.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_dma,
)
from kfunca_tpu.ops.quant import quantize_vecs


def _mk(rng, shape, dt=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dt)


def _fuse(pool_k, pool_v):
    n, p = pool_k.shape[:2]
    return jnp.concatenate(
        [pool_k.reshape(n, p, -1), pool_v.reshape(n, p, -1)], axis=2)


def _fuse_scales(sk, sv):
    # (n_pages, page, Hkv) pair -> slot-major lane-padded
    # (n_pages, page, 128) rows: [sk_h... | sv_h... | 0 pad]
    sc = jnp.concatenate([sk, sv], axis=2)
    return jnp.pad(sc, ((0, 0), (0, 0), (0, 128 - sc.shape[2])))


class TestDmaKernel:
    def _case(self, h, hkv, hd=64):
        rng = np.random.default_rng(5)
        n_pages, page, max_pages, bsz = 16, 4, 4, 3
        pool_k = _mk(rng, (n_pages, page, hkv, hd))
        pool_v = _mk(rng, (n_pages, page, hkv, hd))
        tables = jnp.asarray(
            [[1, 2, 3, 15], [4, 5, 15, 15], [6, 15, 15, 15]], jnp.int32)
        positions = jnp.asarray([13, 6, 2], jnp.int32)
        q = _mk(rng, (bsz, h, hd)) / (hd ** 0.5)
        return pool_k, pool_v, tables, positions, q

    @pytest.mark.parametrize("h,hkv", [(2, 2), (4, 2)])
    @pytest.mark.parametrize("window", [None, 7])
    def test_split_pools_match_blockspec(self, h, hkv, window):
        pool_k, pool_v, tables, positions, q = self._case(h, hkv)
        want = paged_decode_attention(
            q, pool_k, pool_v, tables, positions, window=window,
            interpret=True)
        for depth in (1, 2, 4):
            got = paged_decode_attention_dma(
                q, pool_k, pool_v, tables, positions, window=window,
                depth=depth, interpret=True)
            assert np.allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5), (h, hkv, window, depth)

    @pytest.mark.parametrize("h,hkv", [(2, 2), (4, 2)])
    @pytest.mark.parametrize("window", [None, 7])
    def test_fused_pools_match_blockspec(self, h, hkv, window):
        pool_k, pool_v, tables, positions, q = self._case(h, hkv)
        want = paged_decode_attention(
            q, pool_k, pool_v, tables, positions, window=window,
            interpret=True)
        got = paged_decode_attention_dma(
            q, _fuse(pool_k, pool_v), None, tables, positions,
            window=window, depth=2, interpret=True)
        assert np.allclose(np.asarray(got), np.asarray(want),
                           atol=2e-5), (h, hkv, window)

    @pytest.mark.parametrize("h,hkv", [(2, 2), (4, 2)])
    def test_quantized_split_and_fused(self, h, hkv):
        pool_k, pool_v, tables, positions, q = self._case(h, hkv)
        qk, sk = quantize_vecs(pool_k)
        qv, sv = quantize_vecs(pool_v)
        want = paged_decode_attention(
            q, qk, qv, tables, positions, scales=(sk, sv), interpret=True)
        got = paged_decode_attention_dma(
            q, qk, qv, tables, positions, scales=(sk, sv), depth=2,
            interpret=True)
        assert np.allclose(np.asarray(got), np.asarray(want),
                           atol=2e-5), "split slot-major"
        got = paged_decode_attention_dma(
            q, qk, qv, tables, positions,
            scales=(jnp.swapaxes(sk, 1, 2), jnp.swapaxes(sv, 1, 2)),
            head_major_scales=True, depth=2, interpret=True)
        assert np.allclose(np.asarray(got), np.asarray(want),
                           atol=2e-5), "split head-major"
        got = paged_decode_attention_dma(
            q, _fuse(qk, qv), None, tables, positions,
            scales=_fuse_scales(sk, sv), depth=2, interpret=True)
        assert np.allclose(np.asarray(got), np.asarray(want),
                           atol=2e-5), "fused"

    def test_page_base_reads_stacked_layer(self):
        rng = np.random.default_rng(9)
        L, n_pages, page, hkv, hd = 3, 8, 4, 2, 64
        pools_k = _mk(rng, (L, n_pages, page, hkv, hd))
        pools_v = _mk(rng, (L, n_pages, page, hkv, hd))
        tables = jnp.asarray([[1, 2, 7], [4, 7, 7]], jnp.int32)
        positions = jnp.asarray([6, 3], jnp.int32)
        q = _mk(rng, (2, hkv, hd)) / (hd ** 0.5)
        fused = jnp.stack([_fuse(pools_k[li], pools_v[li])
                           for li in range(L)])
        flat = fused.reshape((L * n_pages,) + fused.shape[2:])
        for li in range(L):
            want = paged_decode_attention(
                q, pools_k[li], pools_v[li], tables, positions,
                interpret=True)
            got = paged_decode_attention_dma(
                q, flat, None, tables, positions, interpret=True,
                page_base=li * n_pages, depth=2)
            assert np.allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5), li

    def test_dead_pages_never_read(self):
        """NaN in unreferenced pages must not leak: the DMA loop's trip
        count covers exactly the live pages."""
        n_pages, page, hkv, hd = 8, 4, 2, 64
        pool = jnp.full((n_pages, page, 2 * hkv * hd), jnp.nan, jnp.float32)
        pool = pool.at[3].set(1.0)
        tables = jnp.asarray([[3, 5, 6]], jnp.int32)  # pages 5,6 are NaN
        positions = jnp.asarray([2], jnp.int32)  # only page 3 is live
        q = jnp.ones((1, hkv, hd), jnp.float32)
        out = paged_decode_attention_dma(
            q, pool, None, tables, positions, depth=2, interpret=True)
        assert np.isfinite(np.asarray(out)).all()


def fused_cfg():
    # kv_heads * head_dim = 2 * 64 = 128: the fused layout's alignment bar
    return TransformerConfig(
        vocab_size=96,
        d_model=128,
        n_heads=2,
        n_layers=2,
        d_ff=128,
        max_seq_len=256,
        dtype="float32",
    )


@pytest.fixture(scope="module")
def fused_model():
    cfg = fused_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    return params, cfg


class TestFusedServingLayout:
    """The fused single-pool layout must be a pure layout change: identical
    tokens to the legacy split layout through admission, prefill scatter,
    decode, prefix-cache reuse, and release."""

    @pytest.mark.parametrize("quantize_kv", [False, True])
    def test_token_parity_vs_legacy_layout(self, fused_model, quantize_kv):
        params, cfg = fused_model
        prompts = [list(range(1, 9)), [3, 4, 5], list(range(20, 40))]
        outs = {}
        for fused in (False, True):
            srv = InferenceServer(
                params, cfg, batch_slots=2, page_size=8, n_pages=32,
                max_pages_per_seq=8, quantize_kv=quantize_kv,
                fused_pool=fused)
            assert srv.fused_pool is fused
            rids = [srv.submit(p, max_new=6) for p in prompts]
            res = srv.run()
            outs[fused] = [res[r] for r in rids]
            assert all(len(t) == 6 for t in outs[fused])
        if quantize_kv:
            # int8 rounding differs between per-vector layouts only via
            # op order; tokens still must match on a greedy tiny model
            assert outs[True] == outs[False]
        else:
            assert outs[True] == outs[False]

    def test_auto_layout_selection(self, fused_model, model_cfg=None):
        params, cfg = fused_model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=8,
                              n_pages=8, max_pages_per_seq=4)
        assert srv.fused_pool  # (2 * 64) % 128 == 0 -> auto-fused
        assert srv.pools_v is None
        assert srv.pools_k.shape[-1] == 2 * cfg.kv_heads * cfg.head_dim

    def test_prefix_cache_roundtrip_fused(self, fused_model):
        """Prefix pages published by one request must seed the next
        request's prefill from the FUSED pool (read path _prefill_cache_init
        + write path _prefill_scatter)."""
        params, cfg = fused_model
        common = list(range(1, 17))  # two full pages at page_size=8
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=8,
                              n_pages=32, max_pages_per_seq=8,
                              prefix_cache=True)
        assert srv.fused_pool
        r1 = srv.submit(common + [50], max_new=4)
        res1 = srv.run()
        r2 = srv.submit(common + [50], max_new=4)
        res2 = srv.run()
        assert res1[r1] == res2[r2]

        # same tokens without prefix cache (fresh server, no reuse)
        srv2 = InferenceServer(params, cfg, batch_slots=1, page_size=8,
                               n_pages=32, max_pages_per_seq=8)
        r3 = srv2.submit(common + [50], max_new=4)
        assert srv2.run()[r3] == res1[r1]
