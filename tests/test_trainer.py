"""Trainer loop (models/trainer.py): deterministic step-indexed batches,
bitwise crash-resume, retention, eval integration."""

import os

import numpy as np

import jax

from kfunca_tpu.models.data import TokenDataset
from kfunca_tpu.models.train import OptConfig
from kfunca_tpu.models.trainer import Trainer, TrainerConfig
from kfunca_tpu.models.transformer import TransformerConfig


def small_cfg():
    return TransformerConfig(vocab_size=96, d_model=32, n_heads=2,
                             n_layers=2, d_ff=64, dtype="float32")


def corpus(n=4096, seed=0):
    return np.random.default_rng(seed).integers(0, 96, n).astype(np.int32)


class TestDeterministicSampling:
    def test_batch_at_is_stateless(self):
        ds = TokenDataset(corpus(), seq_len=16, batch_size=4, seed=7)
        a1, b1 = ds.batch_at(5)
        ds.sample_batch()  # stateful sampling does not disturb batch_at
        a2, b2 = ds.batch_at(5)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)
        a3, _ = ds.batch_at(6)
        assert not np.array_equal(a1, a3)

    def test_iter_from(self):
        ds = TokenDataset(corpus(), seq_len=16, batch_size=4, seed=7)
        it = ds.iter_from(3)
        np.testing.assert_array_equal(next(it)[0], ds.batch_at(3)[0])
        np.testing.assert_array_equal(next(it)[0], ds.batch_at(4)[0])


class TestTrainerLoop:
    def test_fit_trains_and_checkpoints(self, tmp_path):
        cfg = small_cfg()
        # tiny corpus: windows repeat across steps, so the loss must fall
        ds = TokenDataset(corpus(n=64), seq_len=16, batch_size=4, seed=1)
        tc = TrainerConfig(out_dir=str(tmp_path), total_steps=30,
                           ckpt_every=10, log_every=10, keep=2)
        tr = Trainer(cfg, tc, OptConfig(lr=1e-2, weight_decay=0.0))
        seen = []
        out = tr.fit(ds, on_step=lambda s, m: seen.append((s, m["loss"])))
        assert out["step"] == 30
        assert out["history"][-1]["loss"] < out["history"][0]["loss"]
        assert len(seen) == 30
        # retention: keep=2 -> only the 2 newest checkpoint files remain
        files = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))
        assert files == ["step_00000020.npz", "step_00000030.npz"]

    def test_resume_is_bitwise_identical(self, tmp_path):
        """Crash at step 6 + resume == uninterrupted 12-step run, bit for
        bit (stateless batch_at + exact fp32 checkpoint round-trip)."""
        cfg = small_cfg()
        ds = TokenDataset(corpus(), seq_len=16, batch_size=4, seed=1)
        oc = OptConfig(lr=1e-2, weight_decay=0.1, warmup_steps=3,
                       total_steps=12, clip_norm=1.0)

        straight = Trainer(
            cfg, TrainerConfig(out_dir=str(tmp_path / "a"), total_steps=12),
            oc).fit(ds, seed=3)

        # "crash" after 6 steps...
        tc_b = TrainerConfig(out_dir=str(tmp_path / "b"), total_steps=6,
                             ckpt_every=6)
        Trainer(cfg, tc_b, oc).fit(ds, seed=3)
        # ...resume to 12 in the same out_dir
        tc_b2 = TrainerConfig(out_dir=str(tmp_path / "b"), total_steps=12)
        resumed = Trainer(cfg, tc_b2, oc).fit(ds, seed=999)  # seed ignored

        for a, b in zip(jax.tree_util.tree_leaves(straight["params"]),
                        jax.tree_util.tree_leaves(resumed["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_integration(self, tmp_path):
        cfg = small_cfg()
        ds = TokenDataset(corpus(), seq_len=16, batch_size=4, seed=1)
        ev = TokenDataset(corpus(seed=9), seq_len=16, batch_size=4, seed=2)
        tc = TrainerConfig(out_dir=str(tmp_path), total_steps=6,
                           eval_every=3, eval_batches=2)
        out = Trainer(cfg, tc, OptConfig(lr=1e-2)).fit(ds, eval_dataset=ev)
        assert sorted(out["evals"]) == [3, 6]
        for m in out["evals"].values():
            assert np.isfinite(m["perplexity"]) and 0 <= m["token_accuracy"] <= 1
