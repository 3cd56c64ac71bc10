"""DPO preference finetuning (models/dpo.py): sequence-logprob oracle,
loss oracle, full-param and LoRA-DPO training dynamics, chunked parity."""

import numpy as np

import jax
import jax.numpy as jnp

from kfunca_tpu.models.dpo import (
    dpo_loss,
    make_dpo_step,
    make_lora_dpo_step,
    sequence_logprobs,
)
from kfunca_tpu.models.lora import init_lora
from kfunca_tpu.models.train import OptConfig, init_opt_state
from kfunca_tpu.models.transformer import TransformerConfig, forward, init_params


def small_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_ff", 64)
    kw.setdefault("dtype", "float32")
    return TransformerConfig(**kw)


def pair_batch(cfg, b=2, s=12, seed=3):
    """(tok_c, tgt_c, tok_r, tgt_r) with the first 4 target positions
    masked (the 'prompt')."""
    rng = np.random.default_rng(seed)
    mk = lambda: rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32)
    tok_c, tok_r = mk(), mk()
    tgt_c = np.roll(tok_c, -1, axis=1).astype(np.int32)
    tgt_r = np.roll(tok_r, -1, axis=1).astype(np.int32)
    tgt_c[:, :4] = -100
    tgt_r[:, :4] = -100
    return (jnp.asarray(tok_c), jnp.asarray(tgt_c),
            jnp.asarray(tok_r), jnp.asarray(tgt_r))


class TestSequenceLogprobs:
    def test_matches_numpy_oracle_and_chunked_parity(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tok, tgt, _, _ = pair_batch(cfg)
        got_full = np.asarray(sequence_logprobs(
            params, tok, tgt, cfg, vocab_chunk=None))
        got_chunk = np.asarray(sequence_logprobs(
            params, tok, tgt, cfg, vocab_chunk=32))
        logits = np.asarray(forward(params, tok, cfg), np.float64)
        logp = logits - np.log(
            np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)
        ) - logits.max(-1, keepdims=True)
        want = np.zeros(tok.shape[0])
        tgtn = np.asarray(tgt)
        for i in range(tok.shape[0]):
            for t in range(tok.shape[1]):
                if tgtn[i, t] != -100:
                    want[i] += logp[i, t, tgtn[i, t]]
        np.testing.assert_allclose(got_full, want, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got_chunk, want, rtol=1e-4, atol=1e-4)


class TestDPOLoss:
    def test_policy_equals_ref_gives_log2(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        loss, m = dpo_loss(params, params, *pair_batch(cfg), cfg)
        np.testing.assert_allclose(float(loss), np.log(2.0), rtol=1e-6)
        assert float(m["reward_margin"]) == 0.0
        assert float(m["chosen_reward"]) == 0.0

    def test_loss_oracle(self):
        """DPO loss == -mean logsigmoid(beta * margin) computed by hand."""
        cfg = small_cfg()
        pol = init_params(jax.random.PRNGKey(0), cfg)
        ref = init_params(jax.random.PRNGKey(7), cfg)
        batch = pair_batch(cfg)
        beta = 0.25
        loss, m = dpo_loss(pol, ref, *batch, cfg, beta=beta)
        lp = lambda p, tok, tgt: np.asarray(
            sequence_logprobs(p, tok, tgt, cfg, vocab_chunk=None), np.float64)
        tok_c, tgt_c, tok_r, tgt_r = batch
        margin = beta * ((lp(pol, tok_c, tgt_c) - lp(ref, tok_c, tgt_c))
                         - (lp(pol, tok_r, tgt_r) - lp(ref, tok_r, tgt_r)))
        want = np.mean(np.logaddexp(0.0, -margin))  # -logsigmoid(x)
        np.testing.assert_allclose(float(loss), want, rtol=2e-4)
        np.testing.assert_allclose(float(m["reward_margin"]), margin.mean(),
                                   rtol=2e-4)

    def test_label_smoothing(self):
        cfg = small_cfg()
        pol = init_params(jax.random.PRNGKey(0), cfg)
        ref = init_params(jax.random.PRNGKey(7), cfg)
        batch = pair_batch(cfg)
        ls, _ = dpo_loss(pol, ref, *batch, cfg, beta=0.25, label_smoothing=0.5)
        # at ls=0.5 the loss is symmetric: mean of logsigmoid(x), logsigmoid(-x)
        lp = lambda p, tok, tgt: np.asarray(
            sequence_logprobs(p, tok, tgt, cfg, vocab_chunk=None), np.float64)
        tok_c, tgt_c, tok_r, tgt_r = batch
        margin = 0.25 * ((lp(pol, tok_c, tgt_c) - lp(ref, tok_c, tgt_c))
                         - (lp(pol, tok_r, tgt_r) - lp(ref, tok_r, tgt_r)))
        want = np.mean(0.5 * np.logaddexp(0.0, -margin)
                       + 0.5 * np.logaddexp(0.0, margin))
        np.testing.assert_allclose(float(ls), want, rtol=2e-4)


class TestDPOTraining:
    def test_full_param_step_improves_margin(self):
        cfg = small_cfg()
        ref = init_params(jax.random.PRNGKey(0), cfg)
        params = jax.tree_util.tree_map(lambda x: x, ref)  # policy = ref copy
        opt = init_opt_state(params)
        step = jax.jit(make_dpo_step(
            ref, cfg, OptConfig(lr=2e-2, weight_decay=0.0), beta=0.25,
            vocab_chunk=32))
        batch = pair_batch(cfg)
        hist = []
        for _ in range(8):
            params, opt, m = step(params, opt, *batch)
            hist.append({k: float(v) for k, v in m.items()})
        assert hist[-1]["loss"] < hist[0]["loss"]
        assert hist[-1]["reward_margin"] > hist[0]["reward_margin"]
        assert hist[-1]["reward_acc"] == 1.0  # tiny model overfits the pair

    def test_lora_dpo_starts_at_log2_and_freezes_base(self):
        cfg = small_cfg()
        base = init_params(jax.random.PRNGKey(0), cfg)
        before = [np.asarray(x).copy()
                  for x in jax.tree_util.tree_leaves(base)]
        ad = init_lora(jax.random.PRNGKey(1), cfg, rank=4,
                       targets=("wqkv", "wo"))
        opt = init_opt_state(ad["blocks"])
        step = jax.jit(make_lora_dpo_step(
            base, cfg, OptConfig(lr=2e-2, weight_decay=0.0), beta=0.25,
            vocab_chunk=32))
        batch = pair_batch(cfg)
        losses = []
        for i in range(6):
            ad, opt, m = step(ad, opt, *batch)
            losses.append(float(m["loss"]))
        # step-0 loss: policy == base == ref exactly (B = 0)
        np.testing.assert_allclose(losses[0], np.log(2.0), rtol=1e-6)
        assert losses[-1] < losses[0]
        for b4, leaf in zip(before, jax.tree_util.tree_leaves(base)):
            np.testing.assert_array_equal(b4, np.asarray(leaf))
