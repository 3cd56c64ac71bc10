"""Serving engine tests: paged KV correctness vs the dense-cache oracle,
sampling, page allocator recycling, and continuous batching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.generate import generate
from kfunca_tpu.models.serve import InferenceServer, PagePool, RequestQueue, sample_tokens
from kfunca_tpu.models.transformer import TransformerConfig, init_params


def tiny_cfg():
    return TransformerConfig(
        vocab_size=128,
        d_model=64,
        n_heads=2,
        n_layers=2,
        d_ff=128,
        max_seq_len=128,
        dtype="float32",
    )


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


class TestPagePool:
    def test_alloc_free_recycle(self):
        pool = PagePool(8)
        a = pool.alloc(3)
        b = pool.alloc(5)
        assert sorted(a + b) == list(range(8))
        assert pool.alloc(1) is None  # exhausted
        pool.free(a)
        assert pool.available == 3
        c = pool.alloc(3)
        assert sorted(c) == sorted(a)  # recycled

    def test_queue_fifo(self):
        q = RequestQueue()
        assert q.pop() is None
        for i in [7, 8, 9]:
            q.push(i)
        assert len(q) == 3
        assert [q.pop(), q.pop(), q.pop()] == [7, 8, 9]
        assert q.pop() is None


class TestSampling:
    def test_greedy_is_argmax(self):
        logits = jnp.asarray([[0.1, 3.0, -1.0], [5.0, 0.0, 0.0]])
        out = sample_tokens(logits, jax.random.PRNGKey(0), temperature=0.0)
        assert out.tolist() == [1, 0]

    def test_top_p_restricts_support(self):
        # one dominant token (p ~ 0.99) with top_p=0.5 -> always picked
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        for seed in range(5):
            out = sample_tokens(
                logits, jax.random.PRNGKey(seed), temperature=1.0, top_p=0.5
            )
            assert out.tolist() == [0]

    def test_sampled_determinism_per_key(self):
        logits = jax.random.normal(jax.random.PRNGKey(3), (4, 64))
        a = sample_tokens(logits, jax.random.PRNGKey(1), temperature=0.7, top_p=0.9)
        b = sample_tokens(logits, jax.random.PRNGKey(1), temperature=0.7, top_p=0.9)
        assert np.array_equal(np.asarray(a), np.asarray(b))


class TestPagedDecodeParity:
    def test_matches_generate_greedy(self, model):
        """The paged-KV serving path must reproduce the dense-cache
        generate() tokens exactly (greedy)."""
        params, cfg = model
        prompts = [[3, 5, 7], [11, 2, 9, 4], [1]]
        max_new = 8
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4, n_pages=64,
                              max_pages_per_seq=8)
        ids = [srv.submit(p, max_new=max_new) for p in prompts]
        results = srv.run()
        for rid, prompt in zip(ids, prompts):
            want = generate(
                params, jnp.asarray([prompt], jnp.int32), cfg, max_new=max_new
            )
            assert results[rid] == np.asarray(want)[0].tolist(), (rid, prompt)

    def test_continuous_batching_admits_queue(self, model):
        """More requests than slots: all must complete, pages recycled."""
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4, n_pages=32,
                              max_pages_per_seq=4)
        ids = [srv.submit([i + 1, i + 2], max_new=4) for i in range(6)]
        results = srv.run()
        assert sorted(results.keys()) == sorted(ids)
        assert all(len(v) == 4 for v in results.values())
        stats = srv.throughput_stats()
        assert stats["completed"] == 6
        assert stats["pages_available"] == 31  # all pages back (1 is trash)

    def test_eos_frees_slot_early(self, model):
        params, cfg = model
        # discover the greedy 2nd token, then use it as EOS
        probe = InferenceServer(params, cfg, batch_slots=1, page_size=4, n_pages=16,
                                max_pages_per_seq=4)
        rid = probe.submit([5, 6], max_new=4)
        toks = probe.run()[rid]
        eos = toks[1]
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4, n_pages=16,
                              max_pages_per_seq=4, eos_token=eos)
        rid = srv.submit([5, 6], max_new=4)
        out = srv.run()[rid]
        assert out[-1] == eos and len(out) <= 4

    def test_decode_burst_matches_single_step(self, model):
        """Multi-step scheduling (decode_burst) must reproduce the
        single-step greedy tokens exactly, including EOS mid-burst."""
        params, cfg = model
        prompts = [[3, 5, 7], [11, 2, 9, 4], [1], [8, 8]]
        max_new = 9  # not a multiple of the burst: exercises the 1-step tail
        kw = dict(batch_slots=2, page_size=4, n_pages=64, max_pages_per_seq=8)
        one = InferenceServer(params, cfg, **kw)
        ids1 = [one.submit(p, max_new=max_new) for p in prompts]
        want = one.run()
        burst = InferenceServer(params, cfg, decode_burst=4, **kw)
        ids2 = [burst.submit(p, max_new=max_new) for p in prompts]
        got = burst.run()
        for r1, r2 in zip(ids1, ids2):
            assert want[r1] == got[r2], (want[r1], got[r2])
        # EOS mid-burst: the tail past the finish must be discarded —
        # output is the single-step stream truncated at the first EOS
        eos = want[ids1[0]][1]
        srv = InferenceServer(params, cfg, decode_burst=4, eos_token=eos,
                              **kw)
        rid = srv.submit(prompts[0], max_new=max_new)
        out = srv.run()[rid]
        ref = want[ids1[0]]
        assert out == ref[:ref.index(eos) + 1], (out, ref)

    def test_decode_burst_with_penalties(self, model):
        """Penalty counts advance on-device between burst steps: greedy
        repetition-penalized output must match the single-step path."""
        params, cfg = model
        kw = dict(batch_slots=2, page_size=4, n_pages=64, max_pages_per_seq=8)
        outs = []
        for db in (1, 4):
            srv = InferenceServer(params, cfg, decode_burst=db, **kw)
            rid = srv.submit([3, 5, 7], max_new=8, repetition_penalty=1.3,
                             frequency_penalty=0.1)
            outs.append(srv.run()[rid])
        assert outs[0] == outs[1], outs

    def test_oversized_request_rejected(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4, n_pages=16,
                              max_pages_per_seq=2)
        rid = srv.submit(list(range(1, 12)), max_new=8)  # needs 5 pages > 2
        results = srv.run()
        assert results[rid] == []

    def test_pool_exceeding_request_rejected_not_requeued(self, model):
        """A request small enough for a slot's page table but larger than the
        ENTIRE pool must be rejected at admit, not requeued forever (run()
        would otherwise spin through max_steps doing nothing)."""
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4, n_pages=4,
                              max_pages_per_seq=8)
        # needs 5 pages; table allows 8 but the pool only has 3 usable pages
        big = srv.submit(list(range(1, 12)), max_new=8)
        ok = srv.submit([1, 2], max_new=2)  # fits: must still complete
        results = srv.run(max_steps=50)
        assert results[big] == []
        assert len(results[ok]) == 2

    def test_rejected_request_does_not_waste_slot_round(self, model):
        """_admit retries the queue for the same slot after a rejection: with
        one slot, [oversized, ok] must finish ok's tokens in one run."""
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4, n_pages=16,
                              max_pages_per_seq=2)
        bad = srv.submit(list(range(1, 12)), max_new=8)  # needs 5 pages > 2
        ok = srv.submit([3], max_new=3)
        results = srv.run(max_steps=6)  # tight budget: only works if the slot
        #                                 is filled the same round bad is rejected
        assert results[bad] == []
        assert len(results[ok]) == 3


class TestPagedDecodeKernel:
    def test_matches_gather_oracle(self):
        """The ragged paged-decode kernel (interpret mode) must match the
        dense gather+mask math the serving engine uses."""
        from kfunca_tpu.ops.pallas_kernels.paged_attention import paged_decode_attention

        rng = np.random.default_rng(0)
        n_pages, page, h, hd = 16, 4, 2, 128
        bsz, max_pages = 3, 4
        pool_k = jnp.asarray(rng.standard_normal((n_pages, page, h, hd)), jnp.float32)
        pool_v = jnp.asarray(rng.standard_normal((n_pages, page, h, hd)), jnp.float32)
        # distinct pages per sequence, some shared with the trash pattern
        tables = jnp.asarray([[1, 2, 3, 15], [4, 5, 15, 15], [6, 15, 15, 15]], jnp.int32)
        positions = jnp.asarray([9, 6, 2], jnp.int32)  # 3, 2, 1 live pages
        q = jnp.asarray(rng.standard_normal((bsz, h, hd)), jnp.float32) / (hd ** 0.5)

        got = paged_decode_attention(q, pool_k, pool_v, tables, positions, interpret=True)

        # oracle: gather full table width, mask slots > position
        kc = pool_k[tables].reshape(bsz, max_pages * page, h, hd)
        vc = pool_v[tables].reshape(bsz, max_pages * page, h, hd)
        s = jnp.einsum("bhd,blhd->bhl", q.astype(jnp.float32), kc.astype(jnp.float32))
        slot = jnp.arange(max_pages * page, dtype=jnp.int32)[None, None, :]
        s = jnp.where(slot <= positions[:, None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        want = jnp.einsum("bhl,blhd->bhd", p, vc.astype(jnp.float32))
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5), (
            np.abs(np.asarray(got) - np.asarray(want)).max()
        )

    def test_page_base_reads_stacked_layer(self):
        """page_base=li*n_pages over the flattened (L*n_pages, ...) view of
        a stacked pool must equal the kernel on the pools[li] slice — the
        serving engine's restack-free decode layout (serve._paged_block)."""
        from kfunca_tpu.ops.pallas_kernels.paged_attention import (
            paged_decode_attention,
        )

        rng = np.random.default_rng(3)
        L, n_pages, page, h, hd = 3, 8, 4, 2, 128
        bsz, max_pages = 2, 3
        pools_k = jnp.asarray(
            rng.standard_normal((L, n_pages, page, h, hd)), jnp.float32)
        pools_v = jnp.asarray(
            rng.standard_normal((L, n_pages, page, h, hd)), jnp.float32)
        tables = jnp.asarray([[1, 2, 7], [4, 7, 7]], jnp.int32)
        positions = jnp.asarray([6, 3], jnp.int32)
        q = jnp.asarray(rng.standard_normal((bsz, h, hd)), jnp.float32)
        q = q / (hd ** 0.5)
        flat = lambda a: a.reshape((L * n_pages,) + a.shape[2:])
        for li in range(L):
            got = paged_decode_attention(
                q, flat(pools_k), flat(pools_v), tables, positions,
                interpret=True, page_base=li * n_pages)
            want = paged_decode_attention(
                q, pools_k[li], pools_v[li], tables, positions,
                interpret=True)
            assert np.allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6), li

    def test_fanin_equivalence(self):
        """Multi-page-per-grid-step (fanin) must be bit-compatible with the
        one-page kernel, incl. ragged tails (max_pages % fanin != 0) and
        the sliding-window live range."""
        from kfunca_tpu.ops.pallas_kernels.paged_attention import (
            paged_decode_attention,
        )

        rng = np.random.default_rng(7)
        n_pages, page, h, hd = 16, 4, 2, 128
        bsz, max_pages = 3, 5
        pool_k = jnp.asarray(
            rng.standard_normal((n_pages, page, h, hd)), jnp.float32)
        pool_v = jnp.asarray(
            rng.standard_normal((n_pages, page, h, hd)), jnp.float32)
        tables = jnp.asarray(
            [[1, 2, 3, 8, 9], [4, 5, 15, 15, 15], [6, 15, 15, 15, 15]],
            jnp.int32)
        positions = jnp.asarray([17, 6, 2], jnp.int32)
        q = jnp.asarray(rng.standard_normal((bsz, h, hd)),
                        jnp.float32) / (hd ** 0.5)
        for window in (None, 6):
            want = paged_decode_attention(
                q, pool_k, pool_v, tables, positions, window=window,
                interpret=True, fanin=1)
            for fanin in (2, 3, 5):
                got = paged_decode_attention(
                    q, pool_k, pool_v, tables, positions, window=window,
                    interpret=True, fanin=fanin)
                assert np.allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6), (window, fanin)

    def test_mxu_path_equivalence(self):
        """The MXU (flat-tile block-diagonal dot) kernel variant must match
        the VPU kernel for MHA and GQA, windowed and quantized."""
        from kfunca_tpu.ops.pallas_kernels.paged_attention import (
            paged_decode_attention,
        )
        from kfunca_tpu.ops.quant import quantize_vecs

        rng = np.random.default_rng(11)
        n_pages, page, hd = 16, 4, 128
        bsz, max_pages = 3, 4
        tables = jnp.asarray(
            [[1, 2, 3, 15], [4, 5, 15, 15], [6, 15, 15, 15]], jnp.int32)
        positions = jnp.asarray([13, 6, 2], jnp.int32)
        for h, hkv in ((2, 2), (4, 2)):
            pool_k = jnp.asarray(
                rng.standard_normal((n_pages, page, hkv, hd)), jnp.float32)
            pool_v = jnp.asarray(
                rng.standard_normal((n_pages, page, hkv, hd)), jnp.float32)
            qk, qsk = quantize_vecs(pool_k)
            qv, qsv = quantize_vecs(pool_v)
            q = jnp.asarray(rng.standard_normal((bsz, h, hd)),
                            jnp.float32) / (hd ** 0.5)
            for window in (None, 7):
                for quant in (False, True):
                    kw = dict(window=window, interpret=True)
                    if quant:
                        kw["scales"] = (qsk, qsv)
                        args = (qk, qv)
                    else:
                        args = (pool_k, pool_v)
                    want = paged_decode_attention(q, *args, tables,
                                                  positions, **kw)
                    got = paged_decode_attention(q, *args, tables,
                                                 positions, mxu=True, **kw)
                    assert np.allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5), (h, hkv, window, quant)

    def test_dead_pages_never_read(self):
        """Clamped dead steps must not let trash-page contents leak in:
        fill unreferenced pages with NaN and check the output is finite."""
        from kfunca_tpu.ops.pallas_kernels.paged_attention import paged_decode_attention

        n_pages, page, h, hd = 8, 4, 2, 128
        pool_k = jnp.full((n_pages, page, h, hd), jnp.nan, jnp.float32)
        pool_v = jnp.full((n_pages, page, h, hd), jnp.nan, jnp.float32)
        pool_k = pool_k.at[3].set(1.0)
        pool_v = pool_v.at[3].set(2.0)
        tables = jnp.asarray([[3, 7, 7, 7]], jnp.int32)  # pages 1..3 are dead
        positions = jnp.asarray([1], jnp.int32)  # only page 0 (id 3) live
        q = jnp.ones((1, h, hd), jnp.float32) * 0.01
        out = paged_decode_attention(q, pool_k, pool_v, tables, positions, interpret=True)
        assert bool(jnp.isfinite(out).all())
        assert np.allclose(np.asarray(out), 2.0, atol=1e-5)


class TestPrefixCache:
    def _servers(self, model, **kw):
        params, cfg = model
        base = dict(batch_slots=2, page_size=4, n_pages=64, max_pages_per_seq=8)
        base.update(kw)
        return (InferenceServer(params, cfg, **base),
                InferenceServer(params, cfg, prefix_cache=True, **base))

    def test_identical_prompts_hit_and_match(self, model):
        """A repeated prompt reuses its cached prefix pages and produces
        exactly the same greedy tokens as the uncached server."""
        plain, cached = self._servers(model)
        prompt = list(range(1, 13))  # 12 tokens = 3 full pages
        r_plain = [plain.submit(prompt, max_new=6) for _ in range(3)]
        out_plain = plain.run()
        r_cached = [cached.submit(prompt, max_new=6) for _ in range(3)]
        out_cached = cached.run()
        for a, b in zip(r_plain, r_cached):
            assert out_plain[a] == out_cached[b], (out_plain[a], out_cached[b])
        stats = cached.throughput_stats()
        # the 2nd and 3rd submissions reuse the first's full pages (the
        # last-token page is excluded from reuse): 2 pages each
        assert stats["prefix_hit_pages"] >= 4, stats
        assert stats["cached_pages"] >= 2, stats

    def test_shared_prefix_divergent_suffix(self, model):
        """Requests sharing only a prefix still decode correctly (suffix
        prefill attends the gathered prefix KV)."""
        plain, cached = self._servers(model)
        p1 = list(range(1, 13)) + [20, 21]
        p2 = list(range(1, 13)) + [30, 31, 32]
        outs = {}
        for srv, tag in ((plain, "p"), (cached, "c")):
            a = srv.submit(p1, max_new=5)
            b = srv.submit(p2, max_new=5)
            res = srv.run()
            outs[tag] = (res[a], res[b])
        assert outs["p"] == outs["c"], outs

    def test_eviction_under_pool_pressure(self, model):
        """Cache-only pages are evicted when the pool runs dry; requests
        still complete and match the uncached server."""
        params, cfg = model
        plain = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                                n_pages=10, max_pages_per_seq=8)
        cached = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                                 n_pages=10, max_pages_per_seq=8, prefix_cache=True)
        prompts = [list(range(1 + i, 13 + i)) for i in range(3)]  # distinct
        outs = {}
        for srv, tag in ((plain, "p"), (cached, "c")):
            rids = [srv.submit(p, max_new=4) for p in prompts]
            res = srv.run()
            outs[tag] = [res[r] for r in rids]
        assert outs["p"] == outs["c"], outs
        # the pool only has 9 usable pages; caching 3 prompts x 3 pages
        # forces eviction, and no page may leak
        assert cached.pool.available + len(cached._pcache) == 9

    def test_refcounts_never_leak_without_cache(self, model):
        plain, _ = self._servers(model)
        rid = plain.submit(list(range(1, 10)), max_new=4)
        plain.run()
        assert plain.pool.available == 63  # all pages returned
        assert plain._page_refs == {}


class TestMultiLoRA:
    def _adapters(self, cfg, rank, seed, scale=0.2):
        rng = np.random.default_rng(seed)
        ads = []
        for _ in range(cfg.n_layers):
            ads.append({
                "A": rng.standard_normal((cfg.d_model, rank)).astype(np.float32) * scale,
                "B": rng.standard_normal((rank, 3 * cfg.d_model)).astype(np.float32) * scale,
            })
        return ads

    def _merged_params(self, params, ads):
        merged = dict(params)
        blocks = []
        for blk, ad in zip(params["blocks"], ads):
            blk = dict(blk)
            blk["wqkv"] = blk["wqkv"] + jnp.asarray(ad["A"] @ ad["B"])
            blocks.append(blk)
        merged["blocks"] = blocks
        return merged

    def test_zero_adapter_matches_base(self, model):
        params, cfg = model
        base = InferenceServer(params, cfg, batch_slots=2, page_size=4, n_pages=64,
                               max_pages_per_seq=8)
        lora = InferenceServer(params, cfg, batch_slots=2, page_size=4, n_pages=64,
                               max_pages_per_seq=8, max_loras=2, lora_rank=4)
        prompt = [3, 1, 4, 1, 5]
        a = base.submit(prompt, max_new=6)
        b = lora.submit(prompt, max_new=6)  # lora_id=0 (base)
        assert base.run()[a] == lora.run()[b]

    def test_adapter_matches_merged_dense_server(self, model):
        """Tokens under an adapter must equal a server running the DENSE
        merged weights W + A@B (for both prefill and batched decode)."""
        params, cfg = model
        rank = 4
        ads = self._adapters(cfg, rank, seed=11)
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4, n_pages=64,
                              max_pages_per_seq=8, max_loras=2, lora_rank=rank)
        lid = srv.register_lora(ads)
        oracle = InferenceServer(self._merged_params(params, ads), cfg, batch_slots=2,
                                 page_size=4, n_pages=64, max_pages_per_seq=8)
        prompt = [5, 9, 2, 7]
        a = srv.submit(prompt, max_new=6, lora_id=lid)
        b = oracle.submit(prompt, max_new=6)
        got, want = srv.run()[a], oracle.run()[b]
        assert got == want, (got, want)

    def test_mixed_adapter_batch(self, model):
        """Two adapters decode together in one batch; each sequence matches
        its own merged-weights oracle."""
        params, cfg = model
        rank = 4
        ads1 = self._adapters(cfg, rank, seed=21)
        ads2 = self._adapters(cfg, rank, seed=22)
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4, n_pages=64,
                              max_pages_per_seq=8, max_loras=2, lora_rank=rank)
        l1, l2 = srv.register_lora(ads1), srv.register_lora(ads2)
        p1, p2 = [1, 2, 3], [9, 8, 7, 6]
        a = srv.submit(p1, max_new=5, lora_id=l1)
        b = srv.submit(p2, max_new=5, lora_id=l2)
        res = srv.run()
        for prompt, ads, rid in ((p1, ads1, a), (p2, ads2, b)):
            oracle = InferenceServer(self._merged_params(params, ads), cfg,
                                     batch_slots=1, page_size=4, n_pages=32,
                                     max_pages_per_seq=8)
            o = oracle.submit(prompt, max_new=5)
            assert res[rid] == oracle.run()[o], rid

    def test_prefix_cache_keyed_by_adapter(self, model):
        """The same prompt under different adapters must NOT share pages
        (K projections differ), but repeats under ONE adapter must hit."""
        params, cfg = model
        rank = 4
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4, n_pages=64,
                              max_pages_per_seq=8, max_loras=2, lora_rank=rank,
                              prefix_cache=True)
        lid = srv.register_lora(self._adapters(cfg, rank, seed=31))
        prompt = list(range(1, 13))
        r1 = srv.submit(prompt, max_new=3, lora_id=0)
        srv.run()
        hits0 = srv.prefix_hit_pages
        r2 = srv.submit(prompt, max_new=3, lora_id=lid)  # different adapter
        srv.run()
        assert srv.prefix_hit_pages == hits0  # no cross-adapter hits
        r3 = srv.submit(prompt, max_new=3, lora_id=lid)  # same adapter repeat
        srv.run()
        assert srv.prefix_hit_pages > hits0
        # and the adapter run stays oracle-correct under caching
        del r1, r2, r3


class TestGQAServing:
    def test_gqa_server_matches_generate(self):
        """GQA configs serve through the paged path with tokens identical
        to dense-cache generate() (which shares the GQA cache math)."""
        cfg = TransformerConfig(vocab_size=128, d_model=64, n_heads=4,
                                n_kv_heads=2, n_layers=2, d_ff=128,
                                max_seq_len=128, dtype="float32")
        params = init_params(jax.random.PRNGKey(3), cfg)
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4, n_pages=64,
                              max_pages_per_seq=8)
        # pools hold only kv_heads
        assert srv.pools_k.shape[3] == 2
        prompts = [[3, 5, 7], [11, 2, 9, 4]]
        ids = [srv.submit(p, max_new=6) for p in prompts]
        results = srv.run()
        for rid, prompt in zip(ids, prompts):
            want = generate(params, jnp.asarray([prompt], jnp.int32), cfg, max_new=6)
            assert results[rid] == np.asarray(want)[0].tolist(), (rid, prompt)

    def test_gqa_paged_kernel_matches_gather(self):
        """The GQA paged-decode kernel (interpret) == grouped gather oracle."""
        from kfunca_tpu.ops.pallas_kernels.paged_attention import paged_decode_attention

        rng = np.random.default_rng(5)
        n_pages, page, h, hkv, hd = 16, 4, 4, 2, 128
        bsz, max_pages = 2, 4
        pool_k = jnp.asarray(rng.standard_normal((n_pages, page, hkv, hd)), jnp.float32)
        pool_v = jnp.asarray(rng.standard_normal((n_pages, page, hkv, hd)), jnp.float32)
        tables = jnp.asarray([[1, 2, 3, 15], [4, 5, 15, 15]], jnp.int32)
        positions = jnp.asarray([9, 6], jnp.int32)
        q = jnp.asarray(rng.standard_normal((bsz, h, hd)), jnp.float32) / (hd ** 0.5)
        got = paged_decode_attention(q, pool_k, pool_v, tables, positions, interpret=True)

        group = h // hkv
        L = max_pages * page
        kc = pool_k[tables].reshape(bsz, L, hkv, hd)
        vc = pool_v[tables].reshape(bsz, L, hkv, hd)
        qg = q.reshape(bsz, hkv, group, hd)
        s = jnp.einsum("bkgd,blkd->bkgl", qg, kc)
        slot = jnp.arange(L, dtype=jnp.int32)[None, None, None, :]
        s = jnp.where(slot <= positions[:, None, None, None], s, -1e30)
        prob = jax.nn.softmax(s, axis=-1)
        want = jnp.einsum("bkgl,blkd->bkgd", prob, vc).reshape(bsz, h, hd)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5), (
            np.abs(np.asarray(got) - np.asarray(want)).max()
        )

    def test_window_with_prefix_cache_rejected(self):
        """A sliding window invalidates shared-prefix reuse beyond the
        window, so the combination is refused (bare windows now serve)."""
        cfg = TransformerConfig(vocab_size=64, d_model=64, n_heads=4,
                                attention_window=8, n_layers=1, d_ff=64)
        params = init_params(jax.random.PRNGKey(0), cfg)
        with pytest.raises(NotImplementedError):
            InferenceServer(params, cfg, prefix_cache=True)


class TestSlidingWindowServing:
    def _cfg(self, window):
        return TransformerConfig(vocab_size=128, d_model=64, n_heads=2,
                                 n_layers=2, d_ff=128, max_seq_len=128,
                                 attention_window=window, dtype="float32")

    def test_windowed_matches_generate(self):
        """Windowed serving (paged pools + behind-window page freeing) must
        reproduce dense-cache generate() on the same windowed config."""
        cfg = self._cfg(8)
        params = init_params(jax.random.PRNGKey(2), cfg)
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4, n_pages=64,
                              max_pages_per_seq=16)
        # long enough that pages fall wholly behind the window mid-decode
        prompts = [[3, 5, 7, 9, 2, 8], [11, 2, 9, 4]]
        max_new = 14
        ids = [srv.submit(p, max_new=max_new) for p in prompts]
        results = srv.run()
        for rid, prompt in zip(ids, prompts):
            want = generate(
                params, jnp.asarray([prompt], jnp.int32), cfg, max_new=max_new
            )
            assert results[rid] == np.asarray(want)[0].tolist(), (rid, prompt)

    def test_pages_freed_behind_window(self):
        """Decode must return dead pages to the pool WHILE running (footprint
        bound ~ window/page_size, not sequence length)."""
        cfg = self._cfg(8)
        params = init_params(jax.random.PRNGKey(2), cfg)
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4, n_pages=64,
                              max_pages_per_seq=16)
        srv.submit(list(range(1, 7)), max_new=20)
        srv._admit()
        avail_after_admit = srv.pool.available
        grew = False
        for _ in range(20):
            if not any(r is not None for r in srv.slot_req):
                break
            srv._step()
            srv._admit()
            if srv.pool.available > avail_after_admit:
                grew = True
        assert grew, "no page was freed behind the window during decode"
        # and everything is back once the request completes (the pool
        # already excludes the reserved trash page)
        assert srv.pool.available == srv.pool.n_pages

    def test_windowed_paged_kernel_matches_oracle(self):
        """Windowed paged-decode kernel (interpret) == windowed gather oracle,
        with NaN-poisoned pages wholly below the window: the kernel must
        neither read nor mask them (the scheduler has FREED those pages)."""
        from kfunca_tpu.ops.pallas_kernels.paged_attention import paged_decode_attention

        rng = np.random.default_rng(7)
        n_pages, page, h, hd = 16, 4, 2, 128
        bsz, max_pages, window = 2, 6, 7
        pool_k = np.asarray(rng.standard_normal((n_pages, page, h, hd)), np.float32)
        pool_v = np.asarray(rng.standard_normal((n_pages, page, h, hd)), np.float32)
        # seq 0: pos 17 -> live slots (10, 17], first live page 11//4 = 2:
        # table entries 0,1 are dead -> poison their pages entirely
        tables = np.asarray([[1, 2, 3, 4, 5, 15], [6, 7, 8, 15, 15, 15]], np.int32)
        positions = np.asarray([17, 9], np.int32)
        pool_k[1] = np.nan
        pool_k[2] = np.nan
        pool_v[1] = np.nan
        pool_v[2] = np.nan
        # seq 1: pos 9 -> live (2, 9], first live page 3//4 = 0: nothing dead
        q = np.asarray(rng.standard_normal((bsz, h, hd)), np.float32) / (hd ** 0.5)
        got = paged_decode_attention(
            jnp.asarray(q), jnp.asarray(pool_k), jnp.asarray(pool_v),
            jnp.asarray(tables), jnp.asarray(positions),
            window=window, interpret=True,
        )
        assert np.isfinite(np.asarray(got)).all(), "dead NaN page leaked in"

        L = max_pages * page
        kc = np.where(np.isnan(pool_k), 0.0, pool_k)[tables].reshape(bsz, L, h, hd)
        vc = np.where(np.isnan(pool_v), 0.0, pool_v)[tables].reshape(bsz, L, h, hd)
        s = np.einsum("bhd,blhd->bhl", q, kc)
        slot = np.arange(L, dtype=np.int32)[None, None, :]
        pos3 = positions[:, None, None]
        ok = (slot <= pos3) & (slot > pos3 - window)
        s = np.where(ok, s, -1e30)
        s -= s.max(axis=-1, keepdims=True)
        prob = np.exp(s)
        prob /= prob.sum(axis=-1, keepdims=True)
        want = np.einsum("bhl,blhd->bhd", prob, vc)
        assert np.allclose(np.asarray(got), want, atol=1e-5), (
            np.abs(np.asarray(got) - want).max()
        )


class TestPerRequestSampling:
    """Per-request sampling params, EOS overrides, and stop sequences."""

    def test_per_slot_greedy_matches_argmax(self):
        from kfunca_tpu.models.serve import sample_tokens_per_slot

        logits = jax.random.normal(jax.random.PRNGKey(3), (4, 64))
        out = sample_tokens_per_slot(
            logits, jax.random.PRNGKey(0),
            jnp.zeros((4,)), jnp.ones((4,)), jnp.zeros((4,), jnp.int32),
            jnp.zeros((4,)),
        )
        assert np.array_equal(np.asarray(out), np.asarray(jnp.argmax(logits, -1)))

    def test_top_k1_and_min_p1_force_argmax(self):
        from kfunca_tpu.models.serve import sample_tokens_per_slot

        logits = jax.random.normal(jax.random.PRNGKey(5), (3, 64))
        amax = np.asarray(jnp.argmax(logits, -1))
        for kw in (
            dict(top_k=jnp.full((3,), 1, jnp.int32), min_p=jnp.zeros((3,))),
            dict(top_k=jnp.zeros((3,), jnp.int32), min_p=jnp.ones((3,))),
        ):
            for seed in range(4):
                out = sample_tokens_per_slot(
                    logits, jax.random.PRNGKey(seed),
                    jnp.full((3,), 0.9), jnp.ones((3,)), kw["top_k"], kw["min_p"],
                )
                assert np.array_equal(np.asarray(out), amax)

    def test_mixed_batch_keeps_greedy_slot_deterministic(self, model):
        """A sampled request joining the batch must not perturb a greedy
        request's tokens (per-slot vectors, one compiled step)."""
        params, cfg = model
        base = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                               n_pages=32, max_pages_per_seq=4)
        r0 = base.submit([3, 4, 5], max_new=6)
        want = base.run()[r0]

        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=4)
        g = srv.submit([3, 4, 5], max_new=6)
        s = srv.submit([9, 10], max_new=6, temperature=0.8, top_k=8, min_p=0.05)
        out = srv.run()
        assert out[g] == want
        assert len(out[s]) == 6

    def test_per_request_temperature_zero_override(self, model):
        """Server-wide sampling on, but a temperature=0.0 request decodes
        greedily."""
        params, cfg = model
        base = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                               n_pages=32, max_pages_per_seq=4)
        r0 = base.submit([7, 8], max_new=5)
        want = base.run()[r0]

        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                              n_pages=32, max_pages_per_seq=4, temperature=1.0,
                              top_p=0.9)
        rid = srv.submit([7, 8], max_new=5, temperature=0.0)
        assert srv.run()[rid] == want

    def test_per_request_eos_override(self, model):
        params, cfg = model
        probe = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                                n_pages=16, max_pages_per_seq=4)
        rid = probe.submit([5, 6], max_new=6)
        toks = probe.run()[rid]
        eos = toks[2]
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                              n_pages=16, max_pages_per_seq=4)
        rid = srv.submit([5, 6], max_new=6, eos=eos)
        out = srv.run()[rid]
        # greedy is deterministic: ends at the FIRST occurrence of eos
        want = toks[: toks.index(eos) + 1]
        assert out == want

    def test_stop_sequence_ends_request(self, model):
        params, cfg = model
        probe = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                                n_pages=16, max_pages_per_seq=4)
        rid = probe.submit([5, 6], max_new=6)
        toks = probe.run()[rid]
        stop = tuple(toks[1:3])  # 2-token stop sequence
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                              n_pages=16, max_pages_per_seq=4)
        rid = srv.submit([5, 6], max_new=6, stop=[stop])
        out = srv.run()[rid]
        # ends at the FIRST tail match of the stop sequence
        want_len = next(
            i for i in range(2, len(toks) + 1) if tuple(toks[i - 2 : i]) == stop
        )
        assert tuple(out[-2:]) == stop and out == toks[:want_len]


class TestLogprobs:
    def test_greedy_logprob_matches_log_softmax(self, model):
        """Every generated token carries its raw-distribution logprob;
        greedy tokens must carry the max log-softmax value."""
        import jax.scipy.special as jsp
        from kfunca_tpu.models.serve import token_logprobs

        logits = jax.random.normal(jax.random.PRNGKey(2), (3, 64))
        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lp = np.asarray(token_logprobs(logits, toks))
        want = np.asarray(jsp.logsumexp(logits, axis=-1))
        assert np.allclose(lp, np.asarray(jnp.max(logits, -1)) - want, atol=1e-5)

        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=4)
        rid = srv.submit([3, 4, 5], max_new=5)
        out = srv.run()[rid]
        req = srv.requests[rid]
        assert len(req.logprobs) == len(out) == 5
        # log-probs are valid (<= 0) and greedy picks are likeliest tokens
        assert all(p <= 1e-6 for p in req.logprobs), req.logprobs


class TestQuantizedDecode:
    def test_quantized_param_structure(self, model):
        from kfunca_tpu.models.serve import quantize_decode_params

        params, cfg = model
        qp = quantize_decode_params(params)
        blk = qp["blocks"][0]
        for name in ("wqkv", "wo", "w_gate", "w_up", "w_down"):
            q8, scale = blk[name]
            assert q8.dtype == jnp.int8 and q8.shape == params["blocks"][0][name].shape
            assert scale.shape == (q8.shape[1],)
        assert qp["lm_head"][0].shape == (cfg.d_model, cfg.vocab_size)
        assert qp["embed"].dtype == params["embed"].dtype  # gather stays fp
        assert blk["attn_norm"] is params["blocks"][0]["attn_norm"]

    def test_one_step_logits_close_to_fp(self, model):
        """int8 weight quantization error on one decode step stays small
        (per-channel symmetric, ~1% relative)."""
        import jax.scipy.special as jsp
        from kfunca_tpu.models.serve import (
            paged_decode_step, quantize_decode_params, token_logprobs,
        )

        params, cfg = model
        qp = quantize_decode_params(params)
        B, n_pages, page = 2, 8, 4
        shape = (cfg.n_layers, n_pages, page, cfg.kv_heads, cfg.head_dim)
        pk = jnp.zeros(shape, jnp.float32)
        pv = jnp.zeros(shape, jnp.float32)
        tables = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
        pos = jnp.asarray([0, 0], jnp.int32)
        toks = jnp.asarray([5, 9], jnp.int32)
        key = jax.random.PRNGKey(0)
        args = (tables, pos, toks, key, cfg, page)
        t_fp, lp_fp, _, _ = paged_decode_step(params, pk, pv, *args)
        t_q8, lp_q8, _, _ = paged_decode_step(qp, jnp.zeros(shape), jnp.zeros(shape), *args)
        # greedy tokens agree on this margin-comfortable tiny model, and
        # the chosen-token logprobs are close
        assert np.array_equal(np.asarray(t_fp), np.asarray(t_q8))
        assert np.allclose(np.asarray(lp_fp), np.asarray(lp_q8), atol=0.05)

    def test_engine_end_to_end_matches_fp_greedy(self, model):
        params, cfg = model
        base = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                               n_pages=32, max_pages_per_seq=4)
        ids0 = [base.submit([3, 5, 7], max_new=5), base.submit([9, 2], max_new=5)]
        want = base.run()

        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=4,
                              quantize_weights=True)
        ids1 = [srv.submit([3, 5, 7], max_new=5), srv.submit([9, 2], max_new=5)]
        out = srv.run()
        for r0, r1 in zip(ids0, ids1):
            assert out[r1] == want[r0], (out[r1], want[r0])


class TestQuantizedKV:
    def test_kernel_dequant_matches_fp_pools(self):
        """Quantized-pool paged kernel (interpret) == the same kernel run on
        pre-dequantized fp pools: dequant placement is exact, only the int8
        rounding (already in the pools) differs."""
        from kfunca_tpu.ops.pallas_kernels.paged_attention import paged_decode_attention
        from kfunca_tpu.ops.quant import quantize_vecs

        rng = np.random.default_rng(1)
        n_pages, page, h, hd = 16, 4, 2, 128
        bsz, max_pages = 3, 4
        kq, ks = quantize_vecs(jnp.asarray(
            rng.standard_normal((n_pages, page, h, hd)), jnp.float32))
        vq, vs = quantize_vecs(jnp.asarray(
            rng.standard_normal((n_pages, page, h, hd)), jnp.float32))
        tables = jnp.asarray([[1, 2, 3, 15], [4, 5, 15, 15], [6, 15, 15, 15]], jnp.int32)
        positions = jnp.asarray([9, 6, 2], jnp.int32)
        q = jnp.asarray(rng.standard_normal((bsz, h, hd)), jnp.float32) / (hd ** 0.5)

        got = paged_decode_attention(q, kq, vq, tables, positions,
                                     scales=(ks, vs), interpret=True)
        pool_k = kq.astype(jnp.float32) * ks[..., None]
        pool_v = vq.astype(jnp.float32) * vs[..., None]
        want = paged_decode_attention(q, pool_k, pool_v, tables, positions,
                                      interpret=True)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-5), (
            np.abs(np.asarray(got) - np.asarray(want)).max()
        )

    def test_pool_structure(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=16, max_pages_per_seq=4, quantize_kv=True)
        (kq, ks), (vq, vs) = srv.pools_k, srv.pools_v
        assert kq.dtype == jnp.int8 and vq.dtype == jnp.int8
        assert ks.shape == kq.shape[:-1] and ks.dtype == jnp.float32

    def test_one_step_matches_dequantized_pools(self, model):
        """paged_decode_step on (int8, scale) pools vs the fp path run on
        the SAME dequantized values: the read path is exact; the only diff
        is the current token's own KV write (quantized before the attention
        read), so logits agree to the one-vector rounding."""
        from kfunca_tpu.models.serve import paged_decode_step
        from kfunca_tpu.ops.quant import quantize_vecs

        params, cfg = model
        rng = np.random.default_rng(2)
        B, n_pages, page = 2, 8, 4
        shape = (cfg.n_layers, n_pages, page, cfg.kv_heads, cfg.head_dim)
        kq, ks = quantize_vecs(jnp.asarray(rng.standard_normal(shape), jnp.float32))
        vq, vs = quantize_vecs(jnp.asarray(rng.standard_normal(shape), jnp.float32))
        tables = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
        pos = jnp.asarray([3, 5], jnp.int32)
        toks = jnp.asarray([5, 9], jnp.int32)
        args = (tables, pos, toks, jax.random.PRNGKey(0), cfg, page)
        # materialize the fp twins FIRST: the pools are donated (deleted)
        kf = kq.astype(jnp.float32) * ks[..., None]
        vf = vq.astype(jnp.float32) * vs[..., None]
        t_q8, lp_q8, (nkq, nks), _ = paged_decode_step(
            params, (kq, ks), (vq, vs), *args)
        t_fp, lp_fp, _, _ = paged_decode_step(params, kf, vf, *args)
        assert np.array_equal(np.asarray(t_fp), np.asarray(t_q8))
        assert np.allclose(np.asarray(lp_fp), np.asarray(lp_q8), atol=0.05)
        # the step wrote the new tokens' KV back quantized
        assert nkq.dtype == jnp.int8 and nks.dtype == jnp.float32

    def test_engine_deterministic_and_close_to_fp(self, model):
        """kv8 decode is deterministic (two servers, same seed, identical
        outputs) and tracks the fp engine: same output lengths, finite
        logprobs, and the first generated token (pure-prefill logits, no
        quantized reads yet) matches fp exactly."""
        params, cfg = model
        kw = dict(batch_slots=2, page_size=4, n_pages=32, max_pages_per_seq=6)
        prompts = [[3, 5, 7], [9, 2, 4, 1]]
        base = InferenceServer(params, cfg, **kw)
        ids0 = [base.submit(p, max_new=6) for p in prompts]
        want = base.run()
        outs = []
        for _ in range(2):
            srv = InferenceServer(params, cfg, quantize_kv=True, **kw)
            ids = [srv.submit(p, max_new=6) for p in prompts]
            res = srv.run()
            outs.append([res[i] for i in ids])
            for rid in ids:
                req = srv.requests[rid]
                assert len(req.tokens) == 6
                assert all(np.isfinite(lp) and lp <= 1e-6 for lp in req.logprobs)
        assert outs[0] == outs[1]
        for got, rid in zip(outs[0], ids0):
            # prefill runs dense fp; only decode reads quantized KV
            assert got[0] == want[rid][0]

    def test_kv8_with_w8_and_prefix_cache(self, model):
        """Everything on at once: quantized weights + quantized KV + prefix
        caching (cached pages hold int8 KV; admission dequantizes them into
        the dense prefill cache).  Trajectories are deterministic per
        server config; the cache must be hit and outputs well-formed."""
        params, cfg = model
        kw = dict(batch_slots=2, page_size=4, n_pages=64, max_pages_per_seq=8,
                  prefix_cache=True, quantize_weights=True, quantize_kv=True)
        prompt = list(range(1, 13))  # 3 full pages
        srv = InferenceServer(params, cfg, **kw)
        ra = srv.submit(prompt, max_new=5)
        out_a = srv.run()[ra]
        # second identical prompt hits the prefix cache (int8 pages reused)
        rb = srv.submit(prompt, max_new=5)
        out_b = srv.run()[rb]
        assert len(out_a) == len(out_b) == 5
        assert srv.prefix_hit_pages > 0
        # determinism: a fresh identical server reproduces both trajectories
        srv2 = InferenceServer(params, cfg, **kw)
        r2a = srv2.submit(prompt, max_new=5)
        o2a = srv2.run()[r2a]
        r2b = srv2.submit(prompt, max_new=5)
        o2b = srv2.run()[r2b]
        assert (o2a, o2b) == (out_a, out_b)


class TestLogitProcessors:
    def test_repetition_penalty_blocks_repeats(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                              n_pages=16, max_pages_per_seq=6)
        prompt = [3, 5, 7]
        rid = srv.submit(prompt, max_new=8, repetition_penalty=1e9)
        out = srv.run()[rid]
        # with an effectively-infinite penalty no token can repeat, nor
        # can a prompt token reappear (vocab 128 >> 11 tokens used)
        assert len(set(out)) == len(out), out
        assert not (set(out) & set(prompt)), out

    def test_frequency_penalty_blocks_repeats(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                              n_pages=16, max_pages_per_seq=6)
        rid = srv.submit([3, 5, 7], max_new=8, frequency_penalty=1e9)
        out = srv.run()[rid]
        assert len(set(out)) == len(out), out

    def test_logit_bias_forces_token(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                              n_pages=16, max_pages_per_seq=6)
        rid = srv.submit([3, 5], max_new=4, logit_bias={42: 1e9})
        out = srv.run()[rid]
        assert out == [42, 42, 42, 42], out
        # logprobs stay RAW-distribution: the forced token is unlikely
        assert all(lp < -1.0 for lp in srv.requests[rid].logprobs)

    def test_plain_request_unaffected_in_mixed_batch(self, model):
        """Identity penalty rows (rep=1, zero presence/freq/bias) must be
        numeric no-ops: a plain request batched with a penalized one
        reproduces the penalty-free server's tokens exactly."""
        params, cfg = model
        kw = dict(batch_slots=2, page_size=4, n_pages=32, max_pages_per_seq=6)
        base = InferenceServer(params, cfg, **kw)
        rid0 = base.submit([9, 2, 4], max_new=6)
        base.submit([1, 8], max_new=6)
        want = base.run()[rid0]
        srv = InferenceServer(params, cfg, **kw)
        rid1 = srv.submit([9, 2, 4], max_new=6)  # plain
        srv.submit([1, 8], max_new=6, repetition_penalty=5.0)  # penalized
        got = srv.run()[rid1]
        assert got == want, (got, want)


class TestStreaming:
    def test_stream_events_match_run(self, model):
        params, cfg = model
        kw = dict(batch_slots=2, page_size=4, n_pages=32, max_pages_per_seq=6)
        prompts = [[3, 5, 7], [9, 2], [4, 4, 1, 6]]  # 3 reqs > 2 slots
        base = InferenceServer(params, cfg, **kw)
        ids0 = [base.submit(p, max_new=5) for p in prompts]
        want = base.run()

        srv = InferenceServer(params, cfg, **kw)
        ids1 = [srv.submit(p, max_new=5) for p in prompts]
        events = list(srv.stream())
        got = {rid: [] for rid in ids1}
        finals = []
        for rid, tok, lp, last in events:
            got[rid].append(tok)
            assert np.isfinite(lp) and lp <= 1e-6
            if last:
                finals.append(rid)
        assert sorted(finals) == sorted(ids1)  # exactly one final per req
        for r0, r1 in zip(ids0, ids1):
            assert got[r1] == want[r0], (got[r1], want[r0])

    def test_latency_stats_populated(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=6)
        srv.submit([3, 5, 7], max_new=5)
        srv.submit([9, 2], max_new=5)
        srv.run()
        st = srv.throughput_stats()
        assert st["completed"] == 2
        assert st["mean_ttft_s"] > 0 and st["mean_tpot_s"] > 0


class TestTensorParallelServing:
    """mesh=... serving: weights Megatron-sharded, pools sharded over kv
    heads, GSPMD collectives inside the one compiled decode step.  The
    8-device CPU mesh (conftest) stands in for an ICI-connected slice."""

    def _mesh(self, tp):
        from kfunca_tpu.parallel.mesh import make_mesh

        return make_mesh(tp, dp=1, tp=tp)

    def test_tp_matches_single_device_greedy(self, model):
        params, cfg = model  # n_heads=2, kv_heads=2: tp=2 divides
        kw = dict(batch_slots=2, page_size=4, n_pages=32, max_pages_per_seq=6)
        prompts = [[3, 5, 7], [9, 2, 4, 1]]
        base = InferenceServer(params, cfg, **kw)
        ids0 = [base.submit(p, max_new=6) for p in prompts]
        want = base.run()
        srv = InferenceServer(params, cfg, mesh=self._mesh(2), **kw)
        ids1 = [srv.submit(p, max_new=6) for p in prompts]
        out = srv.run()
        for r0, r1 in zip(ids0, ids1):
            assert out[r1] == want[r0], (out[r1], want[r0])
        # the decode weights really are distributed
        blk = srv._decode_params["blocks"][0]["wqkv"]
        assert len(blk.sharding.device_set) == 2

    def test_tp_with_quantized_weights_and_kv(self, model):
        params, cfg = model
        kw = dict(batch_slots=2, page_size=4, n_pages=32, max_pages_per_seq=6,
                  quantize_weights=True, quantize_kv=True)
        base = InferenceServer(params, cfg, **kw)
        r0 = base.submit([3, 5, 7], max_new=6)
        want = base.run()[r0]
        srv = InferenceServer(params, cfg, mesh=self._mesh(2), **kw)
        r1 = srv.submit([3, 5, 7], max_new=6)
        out = srv.run()[r1]
        assert out == want, (out, want)

    def test_tp_indivisible_heads_replicates_pools(self, model):
        params, cfg = model  # kv_heads=2, tp=4: pools must replicate
        kw = dict(batch_slots=1, page_size=4, n_pages=16, max_pages_per_seq=6)
        base = InferenceServer(params, cfg, **kw)
        r0 = base.submit([5, 9, 2], max_new=5)
        want = base.run()[r0]
        srv = InferenceServer(params, cfg, mesh=self._mesh(4), **kw)
        r1 = srv.submit([5, 9, 2], max_new=5)
        out = srv.run()[r1]
        assert out == want, (out, want)


class TestChunkedPrefill:
    """Resumable chunked prefill: long prompts ingest prefill_chunk tokens
    per scheduler iteration while other slots keep decoding."""

    def test_rejects_non_page_multiple(self, model):
        params, cfg = model
        with pytest.raises(ValueError):
            InferenceServer(params, cfg, page_size=4, prefill_chunk=6)

    def test_matches_unchunked_greedy(self, model):
        """Chunked prefill must reproduce the dense generate() tokens
        exactly — long prompt (3 chunks), ragged prompt, and a short
        prompt that stays on the single-shot path."""
        params, cfg = model
        prompts = [list(range(2, 26)), list(range(1, 18)), [3, 5]]
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=64, max_pages_per_seq=12,
                              prefill_chunk=8)
        ids = [srv.submit(p, max_new=6) for p in prompts]
        results = srv.run()
        for rid, prompt in zip(ids, prompts):
            want = generate(
                params, jnp.asarray([prompt], jnp.int32), cfg, max_new=6
            )
            assert results[rid] == np.asarray(want)[0].tolist(), (rid, prompt)

    def test_decode_interleaves_with_prefill(self, model):
        """While a long prompt is mid-prefill, the other slot must keep
        emitting tokens — the whole point of the chunked schedule."""
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=64, max_pages_per_seq=12,
                              prefill_chunk=4)
        rid_a = srv.submit([3, 5], max_new=12)
        rid_b = srv.submit(list(range(1, 17)), max_new=4)  # 4 chunks
        a_tokens_during_prefill = 0
        b_was_prefilling = False
        for rid, tok, lp, last in srv.stream():
            if srv._prefill_state:
                b_was_prefilling = True
                if rid == rid_a:
                    a_tokens_during_prefill += 1
        assert b_was_prefilling
        assert a_tokens_during_prefill >= 2
        # and B still decodes correctly afterwards
        want = generate(
            params, jnp.asarray([list(range(1, 17))], jnp.int32), cfg, max_new=4
        )
        assert srv.requests[rid_b].tokens == np.asarray(want)[0].tolist()

    def test_with_prefix_cache(self, model):
        """Chunked prefill publishes prompt pages on completion; a repeat
        prompt reuses them and still matches the oracle."""
        params, cfg = model
        prompt = list(range(4, 16))
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                              n_pages=64, max_pages_per_seq=12,
                              prefill_chunk=4, prefix_cache=True)
        r0 = srv.submit(prompt, max_new=4)
        r1 = srv.submit(prompt, max_new=4)
        results = srv.run()
        assert srv.prefix_hit_pages > 0
        want = generate(
            params, jnp.asarray([prompt], jnp.int32), cfg, max_new=4
        )
        oracle = np.asarray(want)[0].tolist()
        assert results[r0] == oracle and results[r1] == oracle

    def test_pages_all_recycled(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=10,
                              prefill_chunk=8)
        for i in range(4):
            srv.submit(list(range(1, 14 + i)), max_new=3)
        srv.run()
        assert srv.throughput_stats()["completed"] == 4
        assert srv.pool.available == 31  # page 31 is the trash page


class TestCancel:
    def test_cancel_queued(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                              n_pages=32, max_pages_per_seq=8)
        r0 = srv.submit([3, 5], max_new=6)
        r1 = srv.submit([7, 9], max_new=6)  # waits behind r0
        assert srv.cancel(r1)
        results = srv.run()
        assert len(results[r0]) == 6
        assert srv.requests[r1].cancelled and srv.requests[r1].tokens == []
        assert srv.pool.available == 31

    def test_cancel_active_frees_slot_for_queue(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                              n_pages=32, max_pages_per_seq=8)
        r0 = srv.submit([3, 5], max_new=20)
        r1 = srv.submit([7, 9], max_new=4)
        events = srv.stream()
        got = next(events)  # r0's first token (admission)
        assert got[0] == r0
        assert srv.cancel(r0)
        # drain: r1 must now be admitted and complete
        for _ in events:
            pass
        assert srv.requests[r0].cancelled
        assert 1 <= len(srv.requests[r0].tokens) < 20  # partial output kept
        assert len(srv.requests[r1].tokens) == 4
        assert srv.pool.available == 31

    def test_cancel_mid_prefill(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=10,
                              prefill_chunk=4)
        r0 = srv.submit([3, 5], max_new=8)
        r1 = srv.submit(list(range(1, 17)), max_new=4)  # 4 chunks
        events = srv.stream()
        next(events)  # one iteration: r1 is mid-prefill
        assert srv._prefill_state
        assert srv.cancel(r1)
        assert not srv._prefill_state
        for _ in events:
            pass
        assert srv.requests[r1].cancelled and srv.requests[r1].tokens == []
        assert len(srv.requests[r0].tokens) == 8
        assert srv.pool.available == 31

    def test_cancel_unknown_or_done(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                              n_pages=16, max_pages_per_seq=4)
        assert not srv.cancel(123)
        r0 = srv.submit([3, 5], max_new=2)
        srv.run()
        assert not srv.cancel(r0)  # already finished
        assert not srv.requests[r0].cancelled


class TestInt4Serving:
    def test_w4_param_structure(self, model):
        from kfunca_tpu.models.serve import quantize_decode_params

        params, cfg = model
        qp = quantize_decode_params(params, bits=4)
        blk = qp["blocks"][0]
        for name in ("wqkv", "wo", "w_gate", "w_up", "w_down"):
            q4, scale = blk[name]
            k, n = params["blocks"][0][name].shape
            assert q4.dtype == jnp.int4 and q4.shape == (k, n)
            assert scale.ndim == 2 and scale.shape[1] == n
            assert k % scale.shape[0] == 0
        assert qp["lm_head"][0].dtype == jnp.int4

    def test_w4_one_step_logits_close_to_fp(self, model):
        """int4's statistical noise (~10% RMS on random gaussian weights —
        see tests/test_quant.py) must stay bounded through a full decode
        step; greedy token-exactness is NOT the int4 contract (unlike w8,
        whose 1% noise preserves argmax on this model), so the check is on
        the logit distribution, not the sampled ids."""
        from kfunca_tpu.models.serve import paged_decode_step, quantize_decode_params

        params, cfg = model
        qp = quantize_decode_params(params, bits=4)
        B, n_pages, page = 2, 8, 4
        shape = (cfg.n_layers, n_pages, page, cfg.kv_heads, cfg.head_dim)
        pk = jnp.zeros(shape, jnp.float32)
        pv = jnp.zeros(shape, jnp.float32)
        tables = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
        pos = jnp.asarray([0, 0], jnp.int32)
        toks = jnp.asarray([5, 9], jnp.int32)
        key = jax.random.PRNGKey(0)
        args = (tables, pos, toks, key, cfg, page)
        _, lp_fp, _, _ = paged_decode_step(params, pk, pv, *args)
        t4, lp_q4, _, _ = paged_decode_step(qp, jnp.zeros(shape), jnp.zeros(shape), *args)
        assert np.all((np.asarray(t4) >= 0) & (np.asarray(t4) < cfg.vocab_size))
        assert np.allclose(np.asarray(lp_fp), np.asarray(lp_q4), atol=0.8)

    def test_w4_engine_end_to_end_completes(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=4,
                              quantize_weights="int4")
        ids = [srv.submit([3, 5, 7], max_new=5), srv.submit([9, 2], max_new=5)]
        out = srv.run()
        assert sorted(out) == sorted(ids)
        assert all(len(v) == 5 for v in out.values())
        assert all(0 <= t < cfg.vocab_size for v in out.values() for t in v)
        assert srv.pool.available == 31

    def test_int8_string_alias(self, model):
        from kfunca_tpu.models.serve import quantize_decode_params

        params, cfg = model
        a = InferenceServer(params, cfg, batch_slots=1, page_size=4,
                            n_pages=16, max_pages_per_seq=4,
                            quantize_weights="int8")
        b = quantize_decode_params(params, bits=8)
        assert a._decode_params["blocks"][0]["wqkv"][0].dtype == jnp.int8
        assert b["blocks"][0]["wqkv"][0].dtype == jnp.int8

    def test_bad_mode_rejected(self, model):
        params, cfg = model
        with pytest.raises(ValueError):
            InferenceServer(params, cfg, quantize_weights="int2")

    def test_w4_tensor_parallel_specs(self, model):
        from jax.sharding import PartitionSpec as P
        from kfunca_tpu.models.serve import decode_param_specs, quantize_decode_params

        params, cfg = model
        qp = quantize_decode_params(params, bits=4)
        specs = decode_param_specs(qp)
        blk = specs["blocks"][0]
        assert blk["wqkv"] == (P(None, "tp"), P(None, "tp"))  # col: scale follows n
        assert blk["wo"] == (P("tp", None), P("tp", None))    # row: scale follows k-groups


class TestSubmitDuringStream:
    def test_submit_between_stream_events(self, model):
        """The continuous-batching pattern: feeding arrivals while
        consuming stream() must not break iteration (r5 regression — the
        emit loop iterated self.requests live and a mid-stream submit()
        raised 'dictionary changed size during iteration'), and the
        late request must produce the same greedy tokens as run()."""
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=64, max_pages_per_seq=8)
        first = srv.submit([3, 5, 7], max_new=6)
        late_prompt, late = [11, 2, 9, 4], None
        events = 0
        for _rid, _tok, _lp, _fin in srv.stream():
            events += 1
            if events == 2 and late is None:
                late = srv.submit(late_prompt, max_new=6)
        assert srv.requests[first].done and srv.requests[late].done
        want = generate(params, jnp.asarray([late_prompt], jnp.int32), cfg,
                        max_new=6)
        assert srv.requests[late].tokens == np.asarray(want)[0].tolist()
