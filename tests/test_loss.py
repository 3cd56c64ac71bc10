"""Chunked-vocab cross-entropy: exact parity with the materializing loss.

The chunked path (models/loss.py) must match loss_fn bit-for-tolerance in
both value and gradients — it is the SAME math (fp32-accumulated head
matmul + log-softmax), only streamed.  Cases cover chunk == V, chunk < V,
chunk not dividing V, edge targets (0 and V-1), bf16 activations, and the
train-step wiring (loss_chunk=...)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.loss import chunked_softmax_xent
from kfunca_tpu.models.train import OptConfig, init_opt_state, make_train_step
from kfunca_tpu.models.transformer import (
    TransformerConfig,
    init_params,
    loss_fn,
    loss_fn_chunked,
)


def _naive_nll(x, w, targets):
    logits = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]


class TestChunkedXent:
    @pytest.mark.parametrize("chunk", [100, 32, 48])  # ==V, divides-ish, ragged
    def test_value_matches_naive(self, chunk):
        rng = np.random.default_rng(0)
        n, d, v = 64, 16, 100
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(d, v)), jnp.float32)
        t = jnp.asarray(rng.integers(0, v, size=(n,)), jnp.int32)
        t = t.at[0].set(0).at[1].set(v - 1)  # edge classes
        got = chunked_softmax_xent(x, w, t, chunk)
        want = _naive_nll(x, w, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_grads_match_naive(self):
        rng = np.random.default_rng(1)
        n, d, v = 32, 8, 50
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(d, v)), jnp.float32)
        t = jnp.asarray(rng.integers(0, v, size=(n,)), jnp.int32)

        def f_chunked(x, w):
            return jnp.mean(chunked_softmax_xent(x, w, t, 16))

        def f_naive(x, w):
            return jnp.mean(_naive_nll(x, w, t))

        gx_c, gw_c = jax.grad(f_chunked, argnums=(0, 1))(x, w)
        gx_n, gw_n = jax.grad(f_naive, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_n), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_n), rtol=1e-5, atol=1e-6)

    def test_nonuniform_cotangent(self):
        # per-token cotangents (e.g. masked/weighted losses) flow correctly
        rng = np.random.default_rng(2)
        n, d, v = 16, 8, 24
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(d, v)), jnp.float32)
        t = jnp.asarray(rng.integers(0, v, size=(n,)), jnp.int32)
        wts = jnp.asarray(rng.uniform(0, 1, size=(n,)), jnp.float32)

        g_c = jax.grad(lambda x: jnp.sum(chunked_softmax_xent(x, w, t, 8) * wts))(x)
        g_n = jax.grad(lambda x: jnp.sum(_naive_nll(x, w, t) * wts))(x)
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_n), rtol=1e-5, atol=1e-6)


class TestModelChunkedLoss:
    def _cfg(self, dtype="float32"):
        return TransformerConfig(
            vocab_size=100, d_model=32, n_heads=2, n_layers=2, d_ff=64, dtype=dtype
        )

    def test_loss_and_grads_match(self):
        cfg = self._cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tokens = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) * 7) % cfg.vocab_size
        targets = jnp.roll(tokens, -1, axis=1)

        l_full, g_full = jax.value_and_grad(loss_fn)(params, tokens, targets, cfg)
        l_chunk, g_chunk = jax.value_and_grad(
            lambda p: loss_fn_chunked(p, tokens, targets, cfg, vocab_chunk=48)
        )(params)
        np.testing.assert_allclose(float(l_chunk), float(l_full), rtol=1e-5)
        flat_f, _ = jax.tree_util.tree_flatten(g_full)
        flat_c, _ = jax.tree_util.tree_flatten(g_chunk)
        for a, b in zip(flat_c, flat_f):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_bf16_activations(self):
        cfg = self._cfg(dtype="bfloat16")
        params = init_params(jax.random.PRNGKey(1), cfg)
        tokens = (jnp.arange(2 * 8, dtype=jnp.int32).reshape(2, 8) * 3) % cfg.vocab_size
        targets = jnp.roll(tokens, -1, axis=1)
        l_full = loss_fn(params, tokens, targets, cfg)
        l_chunk = loss_fn_chunked(params, tokens, targets, cfg, vocab_chunk=32)
        # same bf16 trunk; only the head streaming differs (fp32 both ways)
        np.testing.assert_allclose(float(l_chunk), float(l_full), rtol=1e-4)

    def test_train_step_with_loss_chunk(self):
        cfg = self._cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt = init_opt_state(params)
        step = jax.jit(make_train_step(cfg, OptConfig(lr=1e-2), loss_chunk=32))
        tokens = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) * 3) % cfg.vocab_size
        targets = jnp.roll(tokens, -1, axis=1)
        losses = []
        for _ in range(5):
            params, opt, loss = step(params, opt, tokens, targets)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_grad_accum_with_loss_chunk(self):
        cfg = self._cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tokens = (jnp.arange(4 * 8, dtype=jnp.int32).reshape(4, 8) * 5) % cfg.vocab_size
        targets = jnp.roll(tokens, -1, axis=1)
        oc = OptConfig(lr=1e-2)
        opt = init_opt_state(params, oc)
        p1, _, l1 = jax.jit(make_train_step(cfg, oc, loss_chunk=32))(
            params, opt, tokens, targets
        )
        p2, _, l2 = jax.jit(
            make_train_step(cfg, oc, grad_accum=2, loss_chunk=32)
        )(params, opt, tokens, targets)
        np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


class TestIgnoreIndex:
    def _cfg(self):
        return TransformerConfig(
            vocab_size=100, d_model=32, n_heads=2, n_layers=2, d_ff=64,
            dtype="float32",
        )

    def test_masked_equals_loss_over_valid_rows(self):
        """Mask the second sequence entirely: the masked batch loss must
        equal the unmasked loss of the first sequence alone — both paths."""
        cfg = self._cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tokens = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) * 7) % 100
        targets = jnp.roll(tokens, -1, axis=1)
        masked = targets.at[1].set(-100)
        want = loss_fn(params, tokens[:1], targets[:1], cfg)
        got_full = loss_fn(params, tokens, masked, cfg, ignore_index=-100)
        got_chunk = loss_fn_chunked(params, tokens, masked, cfg,
                                    vocab_chunk=48, ignore_index=-100)
        np.testing.assert_allclose(float(got_full), float(want), rtol=1e-5)
        np.testing.assert_allclose(float(got_chunk), float(want), rtol=1e-5)

    def test_masked_grads_ignore_padding(self):
        """Gradients must be invariant to the VALUES at masked positions."""
        cfg = self._cfg()
        params = init_params(jax.random.PRNGKey(1), cfg)
        tokens = (jnp.arange(2 * 8, dtype=jnp.int32).reshape(2, 8) * 3) % 100
        t1 = jnp.roll(tokens, -1, axis=1).at[:, -3:].set(-100)
        f = lambda p, t: loss_fn_chunked(p, tokens, t, cfg, 32, ignore_index=-100)
        g1 = jax.grad(f)(params, t1)
        # same mask, same valid targets -> same grads regardless of what the
        # model would have predicted at the masked tail
        l1, l2 = float(f(params, t1)), float(f(params, t1))
        assert l1 == l2
        g2 = jax.grad(f)(params, t1)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_step_with_ignore_index(self):
        cfg = self._cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt = init_opt_state(params)
        step = jax.jit(make_train_step(cfg, OptConfig(lr=1e-2),
                                       loss_chunk=32, ignore_index=-100))
        tokens = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) * 3) % 100
        targets = jnp.roll(tokens, -1, axis=1).at[:, :4].set(-100)  # SFT-style
        losses = []
        for _ in range(5):
            params, opt, loss = step(params, opt, tokens, targets)
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < losses[0]


class TestEval:
    def test_perplexity_matches_loss(self):
        from kfunca_tpu.models.eval import evaluate, perplexity

        cfg = TransformerConfig(vocab_size=100, d_model=32, n_heads=2,
                                n_layers=2, d_ff=64, max_seq_len=16,
                                dtype="float32")
        params = init_params(jax.random.PRNGKey(0), cfg)
        corpus = np.asarray((np.arange(8 * 17) * 7) % 100, np.int32)
        ppl = perplexity(params, cfg, corpus, batch_size=4, seq_len=16)
        # oracle: mean nll over the same windows via loss_fn
        w = corpus[: 8 * 17].reshape(8, 17)
        want = float(loss_fn(params, jnp.asarray(w[:, :-1]),
                             jnp.asarray(w[:, 1:]), cfg))
        np.testing.assert_allclose(np.log(ppl), want, rtol=1e-5)

        # evaluate() returns consistent aggregates
        stats = evaluate(params, cfg,
                         [(w[:, :-1], w[:, 1:])], vocab_chunk=32)
        np.testing.assert_allclose(stats["nll"], want, rtol=1e-5)
        assert stats["tokens"] == 8 * 16
        assert 0.0 <= stats["token_accuracy"] <= 1.0

    def test_evaluate_with_mask(self):
        from kfunca_tpu.models.eval import evaluate

        cfg = TransformerConfig(vocab_size=100, d_model=32, n_heads=2,
                                n_layers=2, d_ff=64, dtype="float32")
        params = init_params(jax.random.PRNGKey(0), cfg)
        tokens = (np.arange(2 * 16, dtype=np.int32).reshape(2, 16) * 7) % 100
        targets = np.roll(tokens, -1, axis=1)
        targets[1] = -100
        stats = evaluate(params, cfg, [(tokens, targets)],
                         vocab_chunk=32, ignore_index=-100)
        want = float(loss_fn(params, jnp.asarray(tokens[:1]),
                             jnp.asarray(targets[:1]), cfg))
        np.testing.assert_allclose(stats["nll"], want, rtol=1e-5)
        assert stats["tokens"] == 16
