"""Data loading: tokenized-corpus batcher with background host prefetch.

Green-field capability (the reference has no data path at all).  TPU-first
concerns drive the design:

  * the accelerator must never wait on the host: a background thread stages
    the next batches while the current step runs (double-buffered queue),
    and `jax.device_put` overlaps the H2D transfer with compute.
  * batches are (tokens, targets) int32 with STATIC shapes — a partial tail
    batch is dropped rather than emitted (dynamic shapes would recompile).
  * the corpus is a flat token array (numpy or np.memmap for
    larger-than-RAM corpora); sampling is seeded and reproducible.
"""

from __future__ import annotations

import queue
import threading

import jax
import numpy as np


class TokenDataset:
    """Flat token array -> (batch, seq_len) next-token-prediction batches."""

    def __init__(self, tokens, seq_len: int, batch_size: int, *, seed: int = 0, device=None):
        self.tokens = np.asarray(tokens)
        if self.tokens.ndim != 1:
            raise ValueError("TokenDataset expects a flat token array")
        if self.tokens.shape[0] < seq_len + 1:
            raise ValueError("corpus shorter than one sequence")
        self.seq_len = int(seq_len)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.rng = np.random.default_rng(seed)
        self.device = device

    def sample_batch(self):
        """Random contiguous windows (the standard LM pretraining sampler)."""
        starts = self.rng.integers(
            0, self.tokens.shape[0] - self.seq_len - 1, size=self.batch_size
        )
        idx = starts[:, None] + np.arange(self.seq_len + 1)[None, :]
        window = self.tokens[idx].astype(np.int32)
        return window[:, :-1], window[:, 1:]

    def batch_at(self, step: int):
        """Deterministic per-step batch: the sampler is STATELESS in the
        step index (rng seeded from (seed, step)), so checkpoint/resume
        reproduces the exact uninterrupted batch sequence — no rng-state
        serialization, no prefetch-depth skew (models/trainer.py relies
        on this for bitwise-identical resume)."""
        rng = np.random.default_rng((self.seed, int(step)))
        starts = rng.integers(
            0, self.tokens.shape[0] - self.seq_len - 1, size=self.batch_size
        )
        idx = starts[:, None] + np.arange(self.seq_len + 1)[None, :]
        window = self.tokens[idx].astype(np.int32)
        return window[:, :-1], window[:, 1:]

    def iter_from(self, step: int = 0):
        """Infinite deterministic iterator starting at `step`."""
        while True:
            yield self.batch_at(step)
            step += 1

    def __iter__(self):
        while True:
            yield self.sample_batch()


class Prefetcher:
    """Background-thread host staging + async device transfer.

    The TPU-native replacement for a C++ dataloader thread pool: Python only
    *stages* indices/copies (cheap, releases the GIL in numpy), while XLA's
    async dispatch overlaps `device_put` with the running step.
    """

    def __init__(self, dataset: TokenDataset, depth: int = 2):
        self.dataset = dataset
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        for batch in self.dataset:
            if self._stop.is_set():
                return
            staged = jax.device_put(batch, self.dataset.device)
            while not self._stop.is_set():
                try:
                    self.q.put(staged, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next(self):
        return self.q.get()

    def __iter__(self):
        while True:
            yield self.next()

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
