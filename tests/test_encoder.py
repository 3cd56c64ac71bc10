"""Bidirectional text encoder + MLM (models/encoder.py): padding mask
semantics, BERT corruption statistics, loss masking, training, pooled
embeddings."""

import numpy as np

import jax
import jax.numpy as jnp

from kfunca_tpu.models.encoder import (
    IGNORE,
    EncoderConfig,
    embed_pooled,
    encode,
    init_encoder_params,
    make_mlm_train_step,
    mlm_corrupt,
    mlm_loss,
)
from kfunca_tpu.models.train import OptConfig, init_opt_state


def small_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_ff", 64)
    kw.setdefault("max_seq_len", 32)
    kw.setdefault("dtype", "float32")
    return EncoderConfig(**kw)


class TestEncode:
    def test_bidirectional_and_padding_isolation(self):
        """Changing a PADDING token's id must not change any valid
        position's output (padding contributes no keys); changing a VALID
        token must change other positions (bidirectional attention)."""
        cfg = small_cfg()
        params = init_encoder_params(jax.random.PRNGKey(0), cfg)
        tok = (jnp.arange(12, dtype=jnp.int32)[None] * 7) % 96
        valid = jnp.asarray([[True] * 10 + [False] * 2])
        base = np.asarray(encode(params, tok, cfg, valid))

        tok_pad = tok.at[0, 11].set(50)  # padding position
        out = np.asarray(encode(params, tok_pad, cfg, valid))
        np.testing.assert_array_equal(out[:, :10], base[:, :10])

        tok_val = tok.at[0, 0].set(50)  # valid position
        out = np.asarray(encode(params, tok_val, cfg, valid))
        assert np.abs(out[:, 5] - base[:, 5]).max() > 1e-5  # info flows


class TestCorruption:
    def test_statistics_and_purity(self):
        cfg = small_cfg(vocab_size=96)
        tok = jnp.asarray(
            np.random.default_rng(0).integers(2, 96, (64, 32)), jnp.int32)
        key = jax.random.PRNGKey(7)
        inp1, tgt1 = mlm_corrupt(key, tok, cfg, mask_prob=0.15)
        inp2, tgt2 = mlm_corrupt(key, tok, cfg, mask_prob=0.15)
        np.testing.assert_array_equal(np.asarray(inp1), np.asarray(inp2))

        sel = np.asarray(tgt1) != IGNORE
        rate = sel.mean()
        assert 0.12 < rate < 0.18  # ~15%
        inp = np.asarray(inp1)
        tokn = np.asarray(tok)
        masked = (inp == cfg.mask_token) & sel
        kept = (inp == tokn) & sel
        assert 0.7 < masked.sum() / sel.sum() < 0.9     # ~80% [MASK]
        assert kept.sum() / sel.sum() > 0.05            # ~10% kept
        # unselected positions are untouched
        np.testing.assert_array_equal(inp[~sel], tokn[~sel])


class TestMLM:
    def test_loss_ignores_unmasked_targets(self):
        cfg = small_cfg()
        params = init_encoder_params(jax.random.PRNGKey(0), cfg)
        tok = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) * 5) % 96
        tgt = jnp.full_like(tok, IGNORE)
        tgt = tgt.at[:, 3].set(tok[:, 3])
        l1 = float(mlm_loss(params, tok, tgt, cfg))
        # grads only flow from the masked column's loss; an all-IGNORE
        # target row elsewhere changes nothing
        tgt2 = tgt.at[0, 10].set(IGNORE)  # already IGNORE: identical
        l2 = float(mlm_loss(params, tok, tgt2, cfg))
        assert l1 == l2 and np.isfinite(l1)

    def test_training_reduces_loss(self):
        cfg = small_cfg()
        params = init_encoder_params(jax.random.PRNGKey(0), cfg)
        opt = init_opt_state(params)
        step = jax.jit(make_mlm_train_step(
            cfg, OptConfig(lr=5e-3, weight_decay=0.0), vocab_chunk=32))
        tok = jnp.asarray(
            np.random.default_rng(1).integers(2, 96, (8, 16)), jnp.int32)
        losses = []
        for i in range(20):
            params, opt, loss = step(
                params, opt, jax.random.PRNGKey(i), tok)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestPooled:
    def test_unit_norm_and_padding_excluded(self):
        cfg = small_cfg()
        params = init_encoder_params(jax.random.PRNGKey(0), cfg)
        tok = (jnp.arange(2 * 12, dtype=jnp.int32).reshape(2, 12) * 7) % 96
        valid = jnp.asarray([[True] * 8 + [False] * 4] * 2)
        emb = embed_pooled(params, tok, cfg, valid)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-5)
        # oracle: normalize the mean of the first 8 valid positions
        x = np.asarray(encode(params, tok, cfg, valid), np.float64)
        want = x[:, :8].mean(1)
        want /= np.linalg.norm(want, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(emb), want, rtol=1e-4,
                                   atol=1e-5)


class TestBertImport:
    """HF BERT parity: the post-norm arch="bert" path must reproduce
    transformers' BertModel hidden states and pooler output."""

    def _mk(self, seed=4):
        import pytest as _pytest

        torch = _pytest.importorskip("torch")
        _pytest.importorskip("transformers")
        from transformers import BertConfig, BertModel

        hc = BertConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, type_vocab_size=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            attn_implementation="eager",
        )
        torch.manual_seed(seed)
        return torch, BertModel(hc).eval()

    def test_hidden_states_match(self):
        from kfunca_tpu.models.encoder import from_hf_bert

        torch, model = self._mk()
        params, cfg = from_hf_bert(model)
        assert cfg.arch == "bert" and cfg.type_vocab == 2
        rng = np.random.default_rng(4)
        tokens = rng.integers(0, 128, (2, 16)).astype(np.int32)
        tt = rng.integers(0, 2, (2, 16)).astype(np.int32)
        with torch.no_grad():
            want = model(torch.tensor(np.asarray(tokens, np.int64)),
                         token_type_ids=torch.tensor(np.asarray(tt, np.int64)))
        got = np.asarray(encode(params, jnp.asarray(tokens), cfg,
                                token_type=jnp.asarray(tt)))
        ref = want.last_hidden_state.float().numpy()
        assert np.allclose(got, ref, atol=2e-4), np.abs(got - ref).max()

    def test_padding_mask_and_pooler_match(self):
        from kfunca_tpu.models.encoder import bert_pooled, from_hf_bert

        torch, model = self._mk(seed=5)
        params, cfg = from_hf_bert(model)
        rng = np.random.default_rng(5)
        tokens = rng.integers(0, 128, (2, 12)).astype(np.int32)
        am = np.asarray([[1] * 12, [1] * 7 + [0] * 5], np.int64)
        with torch.no_grad():
            want = model(torch.tensor(np.asarray(tokens, np.int64)),
                         attention_mask=torch.tensor(am))
        valid = jnp.asarray(am.astype(bool))
        got = np.asarray(encode(params, jnp.asarray(tokens), cfg, valid=valid))
        ref = want.last_hidden_state.float().numpy()
        # compare only VALID positions (HF still computes padded ones
        # attending over valid keys; ours matches there too, but only
        # valid positions are meaningful downstream)
        m = am.astype(bool)
        assert np.allclose(got[m], ref[m], atol=2e-4), \
            np.abs(got[m] - ref[m]).max()
        pooled = np.asarray(bert_pooled(params, jnp.asarray(tokens), cfg,
                                        valid=valid))
        refp = want.pooler_output.float().numpy()
        assert np.allclose(pooled, refp, atol=2e-4), \
            np.abs(pooled - refp).max()

    def test_scratch_bert_trains_mlm(self):
        """arch="bert" composes with the existing MLM pipeline: scratch
        init + mlm train steps drive the loss down."""
        from kfunca_tpu.models.encoder import init_bert_params, make_mlm_train_step

        cfg = EncoderConfig(vocab_size=96, d_model=32, n_heads=2,
                            n_layers=2, d_ff=64, max_seq_len=32,
                            dtype="float32", arch="bert", type_vocab=2)
        params = init_bert_params(jax.random.PRNGKey(0), cfg)
        opt = init_opt_state(params)
        step = jax.jit(make_mlm_train_step(cfg, vocab_chunk=48))
        key = jax.random.PRNGKey(1)
        tok = (jnp.arange(4 * 24, dtype=jnp.int32).reshape(4, 24) * 11) % 96
        losses = []
        for i in range(30):
            params, opt, loss = step(params, opt,
                                     jax.random.fold_in(key, i), tok)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
