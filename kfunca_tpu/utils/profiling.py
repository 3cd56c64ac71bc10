"""Profiling / tracing utilities.

TPU-native analog of the reference's Launcher profiling mode
(launcher_cuda.h:253-255, :336-349: cudaEvent brackets around each submit):

  * time_fn()           — wall-clock a jitted callable with proper device
                          sync; uses chained iterations + min-of-runs, which
                          stays accurate even when dispatch is remote/async
                          (the cudaEvent-equivalent discipline).
  * profiling_mode()    — context manager mirroring set_profiling_mode(true):
                          every call through time_fn inside is recorded.
  * trace()             — full XLA timeline via jax.profiler (something the
                          reference never had; inspect with TensorBoard).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


def _sync_scalar(x):
    """Force completion with a device->host fetch (block_until_ready can be
    a no-op through relayed/async dispatch paths)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(jax.numpy.ravel(leaf)[:1]))


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median-free robust timing: min over `iters` synced runs (seconds)."""
    for _ in range(warmup):
        _sync_scalar(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync_scalar(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@dataclass
class ProfileRecord:
    name: str
    seconds: float


@dataclass
class Profiler:
    enabled: bool = False
    records: list = field(default_factory=list)

    def record(self, name: str, seconds: float) -> None:
        if self.enabled:
            self.records.append(ProfileRecord(name, seconds))

    def summary(self) -> str:
        lines = ["=== kfunca_tpu profile ==="]
        for r in self.records:
            lines.append(f"{r.name:40s} {r.seconds * 1e3:10.3f} ms")
        return "\n".join(lines)


PROFILER = Profiler()


@contextlib.contextmanager
def profiling_mode():
    """Enable per-op timing collection (Launcher set_profiling_mode analog)."""
    prev = PROFILER.enabled
    PROFILER.enabled = True
    try:
        yield PROFILER
    finally:
        PROFILER.enabled = prev


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
