"""Whisper-family speech-to-text: forward/training, cached-decode parity,
HF parity vs transformers WhisperForConditionalGeneration (logits + greedy
tokens + forced-prompt decoding)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.whisper import (
    IGNORE,
    WhisperConfig,
    from_hf_whisper,
    init_whisper_params,
    make_whisper_train_step,
    sinusoidal_positions,
    whisper_forward,
    whisper_generate,
)


def small_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("n_mels", 8)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_enc_layers", 2)
    kw.setdefault("n_dec_layers", 2)
    kw.setdefault("d_ff", 64)
    kw.setdefault("max_source_positions", 16)  # frames T=32 after stride 2
    kw.setdefault("max_target_positions", 32)
    kw.setdefault("dtype", "float32")
    return WhisperConfig(**kw)


def mel(key, b, t=32, mels=8):
    return jax.random.normal(jax.random.PRNGKey(key), (b, mels, t),
                             jnp.float32)


def toks(key, b, s, v=96):
    return jax.random.randint(jax.random.PRNGKey(key), (b, s), 2, v,
                              jnp.int32)


class TestForward:
    def test_shapes_and_downsampling(self):
        cfg = small_cfg()
        params = init_whisper_params(jax.random.PRNGKey(0), cfg)
        logits = whisper_forward(params, mel(1, 2), toks(2, 2, 5), cfg)
        assert logits.shape == (2, 5, 96) and logits.dtype == jnp.float32

    def test_decoder_causality_and_audio_wired(self):
        cfg = small_cfg()
        params = init_whisper_params(jax.random.PRNGKey(0), cfg)
        dec = toks(3, 1, 6)
        base = whisper_forward(params, mel(4, 1), dec, cfg)
        # audio matters
        other = whisper_forward(params, mel(5, 1), dec, cfg)
        assert np.abs(np.asarray(base) - np.asarray(other)).max() > 1e-4
        # causality
        dec2 = dec.at[0, 4].set((dec[0, 4] + 1) % 96)
        pert = whisper_forward(params, mel(4, 1), dec2, cfg)
        np.testing.assert_allclose(
            np.asarray(base[:, :4]), np.asarray(pert[:, :4]), atol=1e-6)

    def test_train_converges(self):
        cfg = small_cfg()
        params = init_whisper_params(jax.random.PRNGKey(0), cfg)
        from kfunca_tpu.models.train import OptConfig, init_opt_state

        step = jax.jit(make_whisper_train_step(cfg, OptConfig(lr=1e-2)))
        opt = init_opt_state(params)
        feats, labels = mel(6, 4), toks(7, 4, 8)
        labels = labels.at[:, -1].set(IGNORE)
        losses = []
        for _ in range(15):
            params, opt, loss = step(params, opt, feats, labels)
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < 0.6 * losses[0]

    def test_sinusoid_table_matches_hf_layout(self):
        """Concatenated sin|cos halves (the HF Whisper init)."""
        tab = np.asarray(sinusoidal_positions(4, 8))
        assert tab.shape == (4, 8)
        np.testing.assert_allclose(tab[0, :4], 0.0, atol=1e-7)  # sin(0)
        np.testing.assert_allclose(tab[0, 4:], 1.0, atol=1e-7)  # cos(0)


def _hf_whisper():
    pytest.importorskip("transformers")
    import torch
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = HFWhisperConfig(
        vocab_size=96, num_mel_bins=8, d_model=32,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_layers=2, decoder_layers=2, encoder_ffn_dim=64,
        decoder_ffn_dim=64, max_source_positions=16,
        max_target_positions=32, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, activation_function="gelu",
        decoder_start_token_id=0, eos_token_id=1, pad_token_id=2,
        bos_token_id=3, suppress_tokens=[], begin_suppress_tokens=[])
    return WhisperForConditionalGeneration(hf_cfg).eval()


class TestHF:
    def test_logits_match_transformers(self):
        import torch

        model = _hf_whisper()
        params, cfg = from_hf_whisper(model, dtype="float32")
        feats = np.random.RandomState(0).normal(
            size=(2, 8, 32)).astype(np.float32)
        dec = np.random.RandomState(1).randint(2, 96, (2, 5)).astype(np.int64)
        with torch.no_grad():
            ref = model(input_features=torch.from_numpy(feats),
                        decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
        ours = np.asarray(whisper_forward(
            params, jnp.asarray(feats), jnp.asarray(dec, jnp.int32), cfg))
        assert np.abs(ours - ref).max() < 2e-4, np.abs(ours - ref).max()

    def test_greedy_decode_token_exact(self):
        """Cached greedy decode == HF teacher-forced argmax loop."""
        import torch

        model = _hf_whisper()
        params, cfg = from_hf_whisper(model, dtype="float32")
        feats = np.random.RandomState(2).normal(
            size=(1, 8, 32)).astype(np.float32)
        n = 6
        ours = np.asarray(whisper_generate(
            params, jnp.asarray(feats), cfg, max_new_tokens=n))
        dec = np.asarray([[cfg.decoder_start_id]], np.int64)
        with torch.no_grad():
            for i in range(n):
                logits = model(input_features=torch.from_numpy(feats),
                               decoder_input_ids=torch.from_numpy(dec)
                               ).logits.numpy()
                nxt = int(np.argmax(logits[0, -1]))
                assert nxt == ours[0, i], (i, nxt, ours[0])
                if nxt == cfg.eos_id:
                    assert (ours[0, i:] == cfg.eos_id).all()
                    break
                dec = np.concatenate(
                    [dec, [[nxt]]], axis=1)

    def test_forced_prompt_decoding(self):
        """A forced decoder prompt (task-token convention) conditions the
        continuation exactly like teacher forcing."""
        import torch

        model = _hf_whisper()
        params, cfg = from_hf_whisper(model, dtype="float32")
        feats = np.random.RandomState(3).normal(
            size=(1, 8, 32)).astype(np.float32)
        prompt = np.asarray([[5, 9]], np.int64)
        ours = np.asarray(whisper_generate(
            params, jnp.asarray(feats), cfg, max_new_tokens=3,
            prompt=jnp.asarray(prompt, jnp.int32)))
        dec = np.concatenate(
            [[[cfg.decoder_start_id]], prompt], axis=1)
        with torch.no_grad():
            for i in range(3):
                logits = model(input_features=torch.from_numpy(feats),
                               decoder_input_ids=torch.from_numpy(dec)
                               ).logits.numpy()
                nxt = int(np.argmax(logits[0, -1]))
                assert nxt == ours[0, i], (i, nxt, ours[0])
                if nxt == cfg.eos_id:
                    break
                dec = np.concatenate([dec, [[nxt]]], axis=1)


class TestMesh:
    def test_forward_parity_sharded_vs_single(self):
        """dp2 x tp4 Megatron-sharded Whisper == single-device forward."""
        from kfunca_tpu.models.whisper import shard_whisper_params
        from kfunca_tpu.parallel.mesh import make_mesh

        cfg = small_cfg(n_heads=4, d_model=64, d_ff=128)
        params = init_whisper_params(jax.random.PRNGKey(0), cfg)
        feats, dec = mel(20, 2), toks(21, 2, 5)
        ref = whisper_forward(params, feats, dec, cfg)

        mesh = make_mesh(8)
        sharded = shard_whisper_params(params, mesh)
        with mesh:
            out = jax.jit(lambda p, f, d: whisper_forward(p, f, d, cfg))(
                sharded, feats, dec)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4)
