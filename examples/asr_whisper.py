"""ASR end-to-end: raw waveform -> log-mel -> train Whisper -> transcribe.

Runs anywhere (tiny model; CPU-friendly).  Every stage is the production
module:

  * models/audio.py — the on-device log-mel frontend (one jitted program),
  * models/whisper.py — the speech-to-text encoder-decoder, teacher-forced
    training and cached greedy decoding.

The task: each "utterance" is a sequence of pure tones, one of 8
frequencies per 100 ms slot; the transcript is the tone-class sequence,
then EOS.  A 2-layer Whisper learns it to near-perfect sequence accuracy
in a few hundred steps — the eval decodes HELD-OUT waveforms through
whisper_generate, so it exercises the whole pipeline: framing/rfft/mel ->
conv frontend -> cross-attention decoding.

    python examples/asr_whisper.py
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

import jax.numpy as jnp

from kfunca_tpu.models.audio import log_mel_spectrogram
from kfunca_tpu.models.train import OptConfig, init_opt_state
from kfunca_tpu.models.whisper import (
    WhisperConfig, init_whisper_params, make_whisper_train_step,
    whisper_generate)

SR = 16000
SLOT = 1600  # 100 ms per tone
N_TONES = 8
EOS = 1
FIRST = 2  # token id of tone class 0


def make_batch(rng, b, n_slots):
    """(waveforms (B, N), labels (B, n_slots+1)) — tones + EOS."""
    classes = rng.randint(0, N_TONES, (b, n_slots))
    freqs = 300.0 * (2.0 ** (classes * 0.5))  # 300 Hz .. ~3.4 kHz
    t = np.arange(SLOT) / SR
    wave = np.sin(2 * np.pi * freqs[..., None] * t)  # (B, slots, SLOT)
    wave = (wave * 0.5).reshape(b, -1).astype(np.float32)
    labels = np.concatenate(
        [classes + FIRST, np.full((b, 1), EOS)], axis=1)
    return wave, labels.astype(np.int32)


def features(wave, cfg):
    feats = log_mel_spectrogram(jnp.asarray(wave), n_mels=cfg.n_mels)
    return feats[:, :, : 2 * cfg.max_source_positions]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--slots", type=int, default=4)
    args = ap.parse_args()

    n_frames = args.slots * SLOT // 160  # hop = 160
    cfg = WhisperConfig(
        vocab_size=N_TONES + FIRST, n_mels=80, d_model=64, n_heads=2,
        n_enc_layers=2, n_dec_layers=2, d_ff=128,
        max_source_positions=n_frames // 2,
        max_target_positions=args.slots + 4, dtype="float32",
        decoder_start_id=0, eos_id=EOS)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    oc = OptConfig(lr=3e-3, weight_decay=0.0, warmup_steps=20,
                   total_steps=args.steps, min_lr_frac=0.02)
    opt = init_opt_state(params, oc)
    step = jax.jit(make_whisper_train_step(cfg, oc))

    rng = np.random.RandomState(0)
    for i in range(args.steps):
        wave, labels = make_batch(rng, args.batch, args.slots)
        params, opt, loss = step(params, opt, features(wave, cfg),
                                 jnp.asarray(labels))
        if i % 25 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    eval_rng = np.random.RandomState(123)
    wave, labels = make_batch(eval_rng, 32, args.slots)
    out = np.asarray(whisper_generate(
        params, features(wave, cfg), cfg,
        max_new_tokens=args.slots + 1))
    exact = (out == labels).all(axis=1).mean()
    print(f"held-out exact-match: {exact:.1%} "
          f"(sample: want={labels[0].tolist()} got={out[0].tolist()})")
    if exact < 0.9:
        raise SystemExit("expected >=90% exact match")
    print("OK")


if __name__ == "__main__":
    main()
