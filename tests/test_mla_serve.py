"""MLAServer: continuous-batching decode over compressed-latent slots
must reproduce the dense generate() tokens exactly (same absorbed-form
numerics, different batching), across mixed prompt lengths, slot churn,
and the DeepSeek MoE + MLA combination."""

import numpy as np

import jax
import jax.numpy as jnp

from kfunca_tpu.models.generate import generate
from kfunca_tpu.models.mla_serve import MLAServer
from kfunca_tpu.models.transformer import TransformerConfig, init_params


def mla_cfg(**kw):
    defaults = dict(
        vocab_size=96, d_model=64, n_heads=4, n_layers=2, d_ff=128,
        dtype="float32", attention="mla", q_lora_rank=32, kv_lora_rank=16,
        qk_nope_head_dim=8, qk_rope_head_dim=8, max_seq_len=64,
    )
    defaults.update(kw)
    return TransformerConfig(**defaults)


class TestMLAServer:
    def test_greedy_matches_generate_mixed_lengths(self):
        cfg = mla_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        prompts = [[3, 17, 42], [9, 81, 5, 7, 11, 2], [1], [60, 61, 62, 63]]
        want = {}
        for i, pr in enumerate(prompts):
            want[i] = list(np.asarray(generate(
                params, jnp.asarray([pr], jnp.int32), cfg, max_new=6))[0])
        srv = MLAServer(params, cfg, batch_slots=2, max_seq_len=32)
        rids = [srv.submit(pr, max_new=6) for pr in prompts]
        out = srv.run()
        # 4 requests over 2 slots: continuous batching re-admits from the
        # queue as slots free up; tokens must not depend on slot timing
        for i, rid in enumerate(rids):
            assert [int(t) for t in out[rid]] == [int(t) for t in want[i]], (
                i, out[rid], want[i])

    def test_interleaved_rope_and_moe_config(self):
        """DeepSeek-V3-shaped config (interleaved rope, sigmoid MoE with
        shared experts) serves and matches generate()."""
        cfg = mla_cfg(
            rope_interleave=True, n_experts=4, moe_top_k=2, moe_d_ff=32,
            n_shared_experts=1, moe_score="sigmoid", moe_score_bias=True,
            moe_n_group=2, moe_topk_group=1, moe_first_dense=1,
        )
        params = init_params(jax.random.PRNGKey(1), cfg)
        prompt = [5, 9, 2, 4, 33]
        want = list(np.asarray(generate(
            params, jnp.asarray([prompt], jnp.int32), cfg, max_new=5))[0])
        srv = MLAServer(params, cfg, batch_slots=2, max_seq_len=32)
        rid = srv.submit(prompt, max_new=5)
        out = srv.run()[rid]
        assert [int(t) for t in out] == [int(t) for t in want], (out, want)

    def test_eos_frees_slot_and_oversize_rejected(self):
        cfg = mla_cfg()
        params = init_params(jax.random.PRNGKey(2), cfg)
        # find the first greedy token, use it as eos: request finishes at 1
        pr = [3, 1, 4]
        first = int(np.asarray(generate(
            params, jnp.asarray([pr], jnp.int32), cfg, max_new=1))[0][0])
        srv = MLAServer(params, cfg, batch_slots=1, max_seq_len=32,
                        eos_token=first)
        rid = srv.submit(pr, max_new=8)
        rid2 = srv.submit([7, 7], max_new=3)  # runs after the slot frees
        out = srv.run()
        assert out[rid] == [first]
        assert len(out[rid2]) == 3
        import pytest

        with pytest.raises(ValueError, match="max_seq_len"):
            srv.submit(list(range(30)), max_new=8)

    def test_non_pow2_max_seq_len_bucket_clamped(self):
        """A prompt longer than max_seq_len//2 used to bucket PAST a
        non-pow2 cache length (prompt 20, max 24 -> bucket 32 vs cache 24),
        crashing at trace time inside dynamic_update_slice.  The bucket is
        clamped to the cache length instead."""
        cfg = mla_cfg()
        params = init_params(jax.random.PRNGKey(2), cfg)
        prompt = list(range(3, 23))  # 20 tokens
        want = list(np.asarray(generate(
            params, jnp.asarray([prompt], jnp.int32), cfg, max_new=4))[0])
        srv = MLAServer(params, cfg, batch_slots=1, max_seq_len=24)
        rid = srv.submit(prompt, max_new=4)
        out = srv.run()
        assert [int(t) for t in out[rid]] == [int(t) for t in want]
