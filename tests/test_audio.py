"""Audio frontend: log-mel spectrogram parity vs HF WhisperFeatureExtractor
(the numpy oracle transformers uses when torchaudio kernels are absent),
plus an end-to-end raw-audio -> whisper_generate smoke."""

import numpy as np
import pytest

import jax.numpy as jnp

from kfunca_tpu.models.audio import (
    log_mel_spectrogram,
    mel_filter_bank,
    whisper_features,
)


class TestMelBank:
    def test_matches_transformers_filter_bank(self):
        pytest.importorskip("transformers")
        from transformers.audio_utils import mel_filter_bank as hf_bank

        ours = mel_filter_bank(201, 80, 16000)
        theirs = hf_bank(
            num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
            max_frequency=8000.0, sampling_rate=16000, norm="slaney",
            mel_scale="slaney")
        np.testing.assert_allclose(ours, theirs, atol=1e-7)


class TestLogMel:
    def test_matches_whisper_feature_extractor(self):
        pytest.importorskip("transformers")
        from transformers import WhisperFeatureExtractor

        fe = WhisperFeatureExtractor()  # 80 mels, 16 kHz, 30 s window
        rng = np.random.RandomState(0)
        audio = (rng.uniform(-1, 1, 16000) * 0.5).astype(np.float32)
        ref = fe(audio, sampling_rate=16000,
                 return_tensors="np").input_features[0]  # (80, 3000)

        padded = np.zeros(30 * 16000, np.float32)
        padded[:16000] = audio
        ours = np.asarray(log_mel_spectrogram(jnp.asarray(padded)))[0]
        assert ours.shape == ref.shape, (ours.shape, ref.shape)
        assert np.abs(ours - ref).max() < 1e-4, np.abs(ours - ref).max()

    def test_batch_and_frame_count(self):
        audio = jnp.asarray(np.random.RandomState(1).uniform(
            -1, 1, (2, 3200)).astype(np.float32))
        feats = log_mel_spectrogram(audio)
        assert feats.shape == (2, 80, 20)  # 3200 / 160 hop


class TestWhisperFeatures:
    def test_end_to_end_raw_audio(self):
        """whisper_features output drives whisper_generate directly."""
        import jax

        from kfunca_tpu.models.whisper import (
            WhisperConfig, init_whisper_params, whisper_generate)

        cfg = WhisperConfig(
            vocab_size=64, n_mels=80, d_model=32, n_heads=2,
            n_enc_layers=1, n_dec_layers=1, d_ff=64,
            max_source_positions=10, max_target_positions=16,
            dtype="float32")
        params = init_whisper_params(jax.random.PRNGKey(0), cfg)
        audio = jnp.asarray(np.random.RandomState(2).uniform(
            -1, 1, 16000).astype(np.float32))
        feats = whisper_features(audio, cfg, chunk_seconds=0.2)  # tiny clip
        assert feats.shape == (1, 80, 20)
        out = whisper_generate(params, feats, cfg, max_new_tokens=4)
        assert out.shape == (1, 4)
