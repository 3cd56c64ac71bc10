"""Backend selection: XLA everywhere, Pallas kernels on real TPU.

The reference hard-wires CUDA; the TPU rebuild keeps one functional op
surface and picks the execution engine per backend:

  * TPU    -> Pallas kernels for the hot ops (gemm, attention, welford,
              aligned elementwise), XLA for the rest.
  * CPU    -> XLA ops (tests run here on a virtual 8-device mesh); Pallas
              kernels remain testable via interpret=True on tiny shapes.

KFUNCA_FORCE_XLA=1 disables Pallas dispatch (A/B benchmarking knob — the
analog of the reference Launcher's runtime toggles, launcher_cuda.h:245-255).
"""

from __future__ import annotations

import os

import jax


def backend() -> str:
    # NOT cached here: jax's own get_backend cache makes this a few dict
    # lookups, and a process-lifetime lru_cache goes stale across backend
    # resets (entry() on the real TPU followed by dryrun_multichip's
    # virtual CPU mesh dispatched TPU Pallas kernels on CPU — r3 bug)
    return jax.default_backend()


def on_tpu() -> bool:
    return backend() == "tpu"


def use_pallas() -> bool:
    if os.environ.get("KFUNCA_FORCE_XLA", "0") == "1":
        return False
    return on_tpu()


def sync(x):
    """Block until device work finishes (Launcher stream_sync analog)."""
    return jax.block_until_ready(x)
