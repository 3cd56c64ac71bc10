"""Constrained decoding (submit(allowed_fn=)): token-set restriction,
stateful grammar automata, first-token coverage, mixed-batch isolation."""

import numpy as np

import jax

from kfunca_tpu.models.serve import InferenceServer
from kfunca_tpu.models.transformer import TransformerConfig, init_params


def small_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_ff", 64)
    kw.setdefault("dtype", "float32")
    return TransformerConfig(**kw)


def make_srv(params, cfg, **kw):
    kw.setdefault("batch_slots", 2)
    kw.setdefault("n_pages", 64)
    kw.setdefault("page_size", 8)
    return InferenceServer(params, cfg, **kw)


PROMPT = np.arange(1, 9, dtype=np.int32)


class TestConstrained:
    def test_token_set_restriction(self):
        """allowed_fn restricting to {10..19}: every generated token (incl.
        the FIRST, sampled at prefill) lands in the set."""
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        allow = np.zeros(cfg.vocab_size, bool)
        allow[10:20] = True
        srv = make_srv(params, cfg)
        rid = srv.submit(PROMPT, max_new=10,
                         allowed_fn=lambda toks, prompt: allow)
        srv.run()
        out = srv.requests[rid].tokens
        assert len(out) == 10 and all(10 <= t < 20 for t in out)

    def test_stateful_grammar_alternates(self):
        """A 2-state automaton (even-position tokens from set A, odd from
        set B) — the callback sees the generated history and drives the
        state."""
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(1), cfg)
        set_a = np.zeros(cfg.vocab_size, bool)
        set_a[20:30] = True
        set_b = np.zeros(cfg.vocab_size, bool)
        set_b[40:50] = True

        def grammar(toks, prompt):
            return set_a if len(toks) % 2 == 0 else set_b

        srv = make_srv(params, cfg)
        rid = srv.submit(PROMPT, max_new=8, allowed_fn=grammar)
        srv.run()
        out = srv.requests[rid].tokens
        assert len(out) == 8
        for i, t in enumerate(out):
            lo, hi = (20, 30) if i % 2 == 0 else (40, 50)
            assert lo <= t < hi, (i, t)

    def test_none_means_unconstrained_step(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        allow = np.zeros(cfg.vocab_size, bool)
        allow[33] = True

        def gate(toks, prompt):
            return allow if len(toks) < 2 else None  # free after 2 tokens

        srv = make_srv(params, cfg)
        rid = srv.submit(PROMPT, max_new=6, allowed_fn=gate)
        srv.run()
        out = srv.requests[rid].tokens
        assert out[:2] == [33, 33]
        # the free suffix matches the unconstrained continuation of the
        # same context (greedy determinism)
        srv2 = make_srv(params, cfg)
        rid2 = srv2.submit(np.concatenate([PROMPT, [33, 33]]), max_new=4)
        srv2.run()
        assert out[2:] == srv2.requests[rid2].tokens

    def test_mixed_batch_does_not_perturb_unconstrained(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        solo = make_srv(params, cfg)
        r0 = solo.submit(PROMPT, max_new=8)
        solo.run()
        want = solo.requests[r0].tokens

        allow = np.zeros(cfg.vocab_size, bool)
        allow[60:70] = True
        srv = make_srv(params, cfg)
        r1 = srv.submit(PROMPT, max_new=8)  # unconstrained
        r2 = srv.submit(np.arange(3, 11, dtype=np.int32), max_new=8,
                        allowed_fn=lambda t, p: allow)
        srv.run()
        assert srv.requests[r1].tokens == want
        assert all(60 <= t < 70 for t in srv.requests[r2].tokens)

    def test_bad_mask_shape_raises(self):
        import pytest

        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        srv = make_srv(params, cfg)
        srv.submit(PROMPT, max_new=4,
                   allowed_fn=lambda t, p: np.ones(7, bool))
        with pytest.raises(ValueError, match="allowed_fn"):
            srv.run()
