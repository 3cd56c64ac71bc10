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

    def test_oversized_request_rejected(self, model):
        params, cfg = model
        srv = InferenceServer(params, cfg, batch_slots=1, page_size=4, n_pages=16,
                              max_pages_per_seq=2)
        rid = srv.submit(list(range(1, 12)), max_new=8)  # needs 5 pages > 2
        results = srv.run()
        assert results[rid] == []
