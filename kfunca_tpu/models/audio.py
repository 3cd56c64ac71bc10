"""Audio frontend: Whisper's log-mel spectrogram, pure jnp.

Raw 16 kHz waveforms -> the (n_mels, frames) input_features
models/whisper.py consumes, matching HF's WhisperFeatureExtractor
bit-for-bit in structure (hann-windowed reflect-centered STFT, Slaney-
scale/Slaney-normalized triangular mel bank, log10 with an 8-dB dynamic
floor relative to each clip's max, (x+4)/4 scaling, last frame dropped) —
parity pinned to ~1e-5 in tests/test_audio.py.

TPU-first: framing is one gather, the windowed rfft batches over all
frames at once, and the mel projection is a single (frames, n_freqs) x
(n_freqs, n_mels) matmul — the whole pipeline jits into one program, so
feature extraction can live on-device next to the encoder instead of in
a host-side librosa/numpy stage.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _hertz_to_mel(freq):
    """Slaney mel scale (librosa/HTK-Slaney convention): linear below
    1 kHz, logarithmic above."""
    freq = np.asarray(freq, np.float64)
    mels = 3.0 * freq / 200.0
    log_region = freq >= 1000.0
    logstep = math.log(6.4) / 27.0
    return np.where(
        log_region, 15.0 + np.log(np.maximum(freq, 1e-10) / 1000.0) / logstep,
        mels)


def _mel_to_hertz(mels):
    mels = np.asarray(mels, np.float64)
    freq = 200.0 * mels / 3.0
    logstep = math.log(6.4) / 27.0
    return np.where(mels >= 15.0, 1000.0 * np.exp(logstep * (mels - 15.0)),
                    freq)


@lru_cache(maxsize=8)
def mel_filter_bank(n_freqs: int, n_mels: int, sample_rate: int,
                    fmin: float = 0.0, fmax: float | None = None
                    ) -> np.ndarray:
    """(n_freqs, n_mels) Slaney-normalized triangular filters (the
    librosa/transformers construction; host-side numpy, cached)."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    mel_pts = np.linspace(_hertz_to_mel(fmin), _hertz_to_mel(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hertz(mel_pts)  # (n_mels + 2,)
    fft_freqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    # triangles via the slope formulation
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / np.maximum(hz_pts[1:-1] - hz_pts[:-2], 1e-10)
    up = slopes[:, 2:] / np.maximum(hz_pts[2:] - hz_pts[1:-1], 1e-10)
    fb = np.maximum(0.0, np.minimum(down, up))
    # Slaney normalization: constant energy per band
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[None, :]).astype(np.float32)


def log_mel_spectrogram(audio, n_mels: int = 80, sample_rate: int = 16000,
                        n_fft: int = 400, hop: int = 160):
    """audio (B, N) or (N,) float waveform -> (B, n_mels, frames) fp32
    log-mel features (Whisper convention; frames = N // hop).  Jittable."""
    if audio.ndim == 1:
        audio = audio[None]
    audio = audio.astype(jnp.float32)
    n = audio.shape[-1]
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + n // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])  # (frames, n_fft)
    frames = x[:, idx]  # (B, frames, n_fft)
    # periodic hann (== np.hanning(n_fft + 1)[:-1], the HF window)
    window = 0.5 * (1.0 - jnp.cos(
        2.0 * jnp.pi * jnp.arange(n_fft, dtype=jnp.float32) / n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.square(jnp.abs(spec)).astype(jnp.float32)
    fb = jnp.asarray(mel_filter_bank(n_fft // 2 + 1, n_mels, sample_rate))
    mel = jnp.einsum("btf,fm->btm", power, fb)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # per-clip 8-dB dynamic floor, then Whisper's affine scaling
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    log_spec = (jnp.maximum(log_spec, floor) + 4.0) / 4.0
    # Whisper drops the final (center-padded) frame
    return log_spec[:, :-1].transpose(0, 2, 1)


def whisper_features(audio, cfg, sample_rate: int = 16000,
                     chunk_seconds: float = 30.0):
    """Raw waveform -> Whisper input_features: pad/trim to the model's
    30-second window (2 * max_source_positions frames), then log-mel."""
    if audio.ndim == 1:
        audio = audio[None]
    target = int(chunk_seconds * sample_rate)
    n = audio.shape[-1]
    if n < target:
        audio = jnp.pad(audio, ((0, 0), (0, target - n)))
    else:
        audio = audio[:, :target]
    feats = log_mel_spectrogram(audio, n_mels=cfg.n_mels,
                                sample_rate=sample_rate)
    return feats[:, :, : 2 * cfg.max_source_positions]
