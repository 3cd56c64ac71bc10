"""Mamba continuous-batching server: bucketed-prefill exactness, greedy
parity vs generate(), slot multiplexing, EOS, sampled temperature."""

import numpy as np

import jax
import jax.numpy as jnp

from kfunca_tpu.models.mamba import (
    MambaConfig,
    forward,
    generate,
    init_mamba_params,
)
from kfunca_tpu.models.mamba_serve import MambaServer


def small_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_state", 8)
    kw.setdefault("dt_rank", 4)
    kw.setdefault("dtype", "float32")
    return MambaConfig(**kw)


def params_of(seed=0):
    return init_mamba_params(jax.random.PRNGKey(seed), small_cfg())


class TestServer:
    def test_greedy_matches_generate_mixed_lengths(self):
        """Requests of different prompt lengths (different pad buckets),
        admitted together, reproduce the dense generate() tokens."""
        cfg = small_cfg()
        params = params_of()
        prompts = [[5, 9, 11], [7, 3, 2, 8, 30, 12, 4], [44, 2]]
        n = 6
        srv = MambaServer(params, cfg, batch_slots=2)
        rids = [srv.submit(p, max_new=n) for p in prompts]
        out = srv.run()
        for rid, p in zip(rids, prompts):
            want = np.asarray(generate(
                params, jnp.asarray([p], jnp.int32), cfg,
                max_new_tokens=n))[0]
            np.testing.assert_array_equal(out[rid], want, err_msg=str(p))

    def test_more_requests_than_slots(self):
        cfg = small_cfg()
        params = params_of()
        srv = MambaServer(params, cfg, batch_slots=2)
        rids = [srv.submit([i + 2, i + 3], max_new=4) for i in range(5)]
        out = srv.run()
        assert sorted(out.keys()) == sorted(rids)
        for r in rids:
            assert len(out[r]) == 4

    def test_eos_stops_early(self):
        cfg = small_cfg()
        params = params_of()
        probe = MambaServer(params, cfg, batch_slots=1)
        rid = probe.submit([5, 6], max_new=5)
        toks = probe.run()[rid]
        eos = toks[2]
        first = toks.index(eos)  # eos may first occur before index 2
        srv = MambaServer(params, cfg, batch_slots=1, eos_token=eos)
        rid = srv.submit([5, 6], max_new=5)
        out = srv.run()[rid]
        assert out == toks[: first + 1]  # stopped AT the eos token

    def test_sampled_temperature_reproducible(self):
        """temp>0 requests sample; a fixed server seed reproduces them,
        and greedy requests in the same batch stay greedy-exact."""
        cfg = small_cfg()
        params = params_of()

        def run(seed):
            srv = MambaServer(params, cfg, batch_slots=2, seed=seed)
            rs = srv.submit([5, 9, 11], max_new=6, temperature=1.0)
            rg = srv.submit([7, 3, 2, 8], max_new=6)
            out = srv.run()
            return out[rs], out[rg]

        s1, g1 = run(0)
        s2, g2 = run(0)
        s3, _ = run(1)
        assert s1 == s2 and g1 == g2
        assert s1 != s3  # different server seed, different sample path
        want = np.asarray(generate(
            params, jnp.asarray([[7, 3, 2, 8]], jnp.int32), cfg,
            max_new_tokens=6))[0]
        np.testing.assert_array_equal(g1, want)

    def test_bucketed_prefill_exact(self):
        """The padded prefill state equals the state of a full forward
        over the unpadded prompt: the first served token == teacher-forced
        argmax."""
        cfg = small_cfg()
        params = params_of()
        prompt = [9, 4, 17, 2, 30]  # pads to bucket 8
        logits = forward(params, jnp.asarray([prompt], jnp.int32), cfg)
        want_first = int(jnp.argmax(logits[0, -1]))
        srv = MambaServer(params, cfg, batch_slots=1)
        rid = srv.submit(prompt, max_new=1)
        assert srv.run()[rid] == [want_first]
