"""T5-family encoder-decoder: forward/training, relative-bucket oracle,
cache-vs-full decode parity, HF parity vs transformers
T5ForConditionalGeneration (relu/tied AND gated-gelu/untied variants),
export roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.t5 import (
    IGNORE,
    T5Config,
    from_hf_t5,
    init_t5_params,
    make_t5_train_step,
    params_from_hf_t5,
    relative_position_bucket,
    shift_right,
    t5_encode,
    t5_forward,
    t5_generate,
    t5_loss,
    to_hf_t5,
)


def small_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("d_kv", 8)  # inner 16 != d_model 32: the decoupled width
    kw.setdefault("d_ff", 64)
    kw.setdefault("n_enc_layers", 2)
    kw.setdefault("n_dec_layers", 2)
    kw.setdefault("dtype", "float32")
    return T5Config(**kw)


def toks(key, b, s, v=96):
    return jax.random.randint(jax.random.PRNGKey(key), (b, s), 2, v,
                              jnp.int32)


class TestForward:
    def test_shapes_and_masking(self):
        cfg = small_cfg()
        params = init_t5_params(jax.random.PRNGKey(0), cfg)
        enc, dec = toks(1, 2, 10), toks(2, 2, 6)
        logits = t5_forward(params, enc, dec, cfg)
        assert logits.shape == (2, 6, 96) and logits.dtype == jnp.float32

        # encoder padding isolation: padding the input must not change the
        # valid positions' encodings
        short = t5_encode(params, enc[:, :7], cfg)
        valid = jnp.concatenate(
            [jnp.ones((2, 7), bool), jnp.zeros((2, 3), bool)], axis=1)
        padded = t5_encode(params, enc, cfg, valid=valid)
        np.testing.assert_allclose(
            np.asarray(short), np.asarray(padded[:, :7]), atol=1e-5)

    def test_decoder_causality(self):
        """Changing a later decoder token must not change earlier logits."""
        cfg = small_cfg()
        params = init_t5_params(jax.random.PRNGKey(0), cfg)
        enc, dec = toks(3, 1, 8), toks(4, 1, 6)
        base = t5_forward(params, enc, dec, cfg)
        dec2 = dec.at[0, 4].set((dec[0, 4] + 1) % 96)
        pert = t5_forward(params, enc, dec2, cfg)
        np.testing.assert_allclose(
            np.asarray(base[:, :4]), np.asarray(pert[:, :4]), atol=1e-6)
        assert np.abs(np.asarray(base[:, 4:]) -
                      np.asarray(pert[:, 4:])).max() > 1e-4

    def test_cross_attention_wired(self):
        """Decoder logits must depend on the encoder input."""
        cfg = small_cfg()
        params = init_t5_params(jax.random.PRNGKey(0), cfg)
        dec = toks(5, 1, 4)
        a = t5_forward(params, toks(6, 1, 8), dec, cfg)
        b = t5_forward(params, toks(7, 1, 8), dec, cfg)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4

    def test_train_converges(self):
        cfg = small_cfg()
        params = init_t5_params(jax.random.PRNGKey(0), cfg)
        from kfunca_tpu.models.train import OptConfig, init_opt_state

        step = jax.jit(make_t5_train_step(cfg, OptConfig(lr=3e-3)))
        opt = init_opt_state(params)
        enc, labels = toks(8, 4, 10), toks(9, 4, 8)
        labels = labels.at[:, -2:].set(IGNORE)  # exercise loss masking
        losses = []
        for _ in range(12):
            params, opt, loss = step(params, opt, enc, labels)
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < 0.6 * losses[0]

    def test_ignore_positions_no_grad(self):
        """Loss must be invariant to the token VALUE at IGNORE positions."""
        cfg = small_cfg()
        params = init_t5_params(jax.random.PRNGKey(0), cfg)
        enc = toks(10, 2, 8)
        lab = toks(11, 2, 6).at[:, 3].set(IGNORE)
        l1 = float(t5_loss(params, enc, lab, cfg))
        # shift_right feeds pad at IGNORE slots, so downstream inputs match
        l2 = float(t5_loss(params, enc, lab, cfg))
        assert l1 == l2 and np.isfinite(l1)

    def test_shift_right(self):
        cfg = small_cfg(decoder_start_id=7, pad_id=3)
        lab = jnp.asarray([[5, IGNORE, 9]], jnp.int32)
        out = np.asarray(shift_right(lab, cfg))
        np.testing.assert_array_equal(out, [[7, 5, 3]])


class TestBuckets:
    @pytest.mark.parametrize("bidirectional", [True, False])
    def test_matches_transformers_oracle(self, bidirectional):
        pytest.importorskip("transformers")
        import torch
        from transformers.models.t5.modeling_t5 import T5Attention

        rel = jnp.arange(-300, 301, dtype=jnp.int32)
        ours = np.asarray(relative_position_bucket(
            rel, bidirectional, 32, 128))
        theirs = T5Attention._relative_position_bucket(
            torch.arange(-300, 301), bidirectional=bidirectional,
            num_buckets=32, max_distance=128).numpy()
        np.testing.assert_array_equal(ours, theirs)


class TestGenerate:
    @pytest.mark.slow  # 6 uncached-forward recompiles; the fast tier keeps
    # the HF token-exact greedy pin (TestHF) on the cached decode path
    def test_cache_matches_teacher_forcing(self):
        """Greedy cached generation == argmax re-decoding the full prefix
        through the uncached forward at every step."""
        cfg = small_cfg()
        params = init_t5_params(jax.random.PRNGKey(1), cfg)
        enc = toks(12, 2, 8)
        n = 6
        got = np.asarray(t5_generate(params, enc, cfg, max_new_tokens=n,
                                     eos_id=-1))  # no EOS: full length
        dec = jnp.full((2, 1), cfg.decoder_start_id, jnp.int32)
        for i in range(n):
            logits = t5_forward(params, enc, dec, cfg)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            np.testing.assert_array_equal(np.asarray(nxt), got[:, i])
            dec = jnp.concatenate([dec, nxt[:, None]], axis=1)

    def test_eos_padding(self):
        """Positions after a sequence's EOS hold pad_id."""
        cfg = small_cfg()
        params = init_t5_params(jax.random.PRNGKey(1), cfg)
        enc = toks(13, 1, 8)
        full = np.asarray(t5_generate(params, enc, cfg, max_new_tokens=8,
                                      eos_id=-1))[0]
        eos = int(full[2])  # force EOS at step 2
        out = np.asarray(t5_generate(params, enc, cfg, max_new_tokens=8,
                                     eos_id=eos))[0]
        np.testing.assert_array_equal(out[:3], full[:3])
        assert (out[3:] == cfg.pad_id).all()


def _hf_t5(gated: bool):
    pytest.importorskip("transformers")
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=2,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=not gated, decoder_start_token_id=0,
        pad_token_id=0, eos_token_id=1)
    return T5ForConditionalGeneration(hf_cfg).eval()


class TestHF:
    @pytest.mark.parametrize("gated", [False, True])
    def test_logits_match_transformers(self, gated):
        import torch

        model = _hf_t5(gated)
        params, cfg = from_hf_t5(model, dtype="float32")
        assert cfg.mlp_type == ("gated-gelu" if gated else "relu")
        assert cfg.tied_head == (not gated)
        enc = np.random.RandomState(0).randint(2, 96, (2, 9)).astype(np.int64)
        dec = np.random.RandomState(1).randint(2, 96, (2, 5)).astype(np.int64)
        with torch.no_grad():
            ref = model(input_ids=torch.from_numpy(enc),
                        decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
        ours = np.asarray(t5_forward(
            params, jnp.asarray(enc, jnp.int32), jnp.asarray(dec, jnp.int32),
            cfg))
        assert np.abs(ours - ref).max() < 2e-4, np.abs(ours - ref).max()

    def test_greedy_generation_token_exact(self):
        import torch

        model = _hf_t5(False)
        params, cfg = from_hf_t5(model, dtype="float32")
        enc = np.random.RandomState(2).randint(2, 96, (2, 7)).astype(np.int64)
        with torch.no_grad():
            ref = model.generate(
                torch.from_numpy(enc), max_new_tokens=8, do_sample=False,
                num_beams=1).numpy()[:, 1:]  # drop decoder_start
        ours = np.asarray(t5_generate(
            params, jnp.asarray(enc, jnp.int32), cfg, max_new_tokens=8,
            eos_id=1))
        for b in range(2):
            n = min(len(ref[b]), 8)
            # HF stops the whole batch at max length; compare up to each
            # sequence's EOS (ours pads with pad_id after EOS, HF pads too)
            np.testing.assert_array_equal(ours[b, :n], ref[b, :n])

    def test_export_roundtrip(self):
        model = _hf_t5(True)
        params, cfg = from_hf_t5(model, dtype="float32")
        sd = to_hf_t5(params, cfg)
        params2 = params_from_hf_t5(sd, cfg)
        enc, dec = toks(14, 1, 6), toks(15, 1, 4)
        np.testing.assert_allclose(
            np.asarray(t5_forward(params, enc, dec, cfg)),
            np.asarray(t5_forward(params2, enc, dec, cfg)), atol=1e-6)


class TestMesh:
    def test_forward_parity_sharded_vs_single(self):
        """dp2 x tp4 Megatron-sharded T5 == the single-device forward."""
        from kfunca_tpu.models.t5 import shard_t5_params
        from kfunca_tpu.parallel.mesh import make_mesh

        cfg = small_cfg(d_kv=8, n_heads=4)  # heads divisible by tp=4
        params = init_t5_params(jax.random.PRNGKey(0), cfg)
        enc, dec = toks(20, 2, 8), toks(21, 2, 6)
        ref = t5_forward(params, enc, dec, cfg)

        mesh = make_mesh(8)
        sharded = shard_t5_params(params, mesh, cfg)
        with mesh:
            out = jax.jit(lambda p, e, d: t5_forward(p, e, d, cfg))(
                sharded, enc, dec)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4)
