"""Launcher: device enumeration, selection, sync and profiling toggles.

TPU-native analog of the reference's Launcher singleton
(/root/reference/src/device/launcher_cuda.h): the CUDA version owns streams
and raw kernel launches; on TPU the XLA runtime owns execution, so the
Launcher's real jobs become

  * device enumeration + cached properties (launcher_cuda.h:258-291),
  * current-device selection threaded to allocations/ingest (:139-147),
  * submit(): the generic launch wrapper (:315-353) and the funnel for
    every eager op launch — core/dispatch.py routes all fused elementwise
    programs through it and ops/gemm.py its gemm program — applying the
    sync policy and, in profiling mode, robust wall-clock timing recorded
    to the profiler (the cudaEvent bracket analog),
  * sync_mode: the reference synchronizes after every launch by default
    (:290); here sync_mode=True forces a device fetch after each submit —
    off by default because XLA's async dispatch is the TPU-native execution
    model and implicit sync costs a relay round-trip.
"""

from __future__ import annotations

import threading
import time

import jax
import numpy as np


class Launcher:
    _instance = None
    _lock = threading.Lock()

    def __init__(self):
        self._device_index = 0
        self.sync_mode = False
        self.profiling_mode = False

    @classmethod
    def instance(cls) -> "Launcher":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    # -- devices -----------------------------------------------------------

    def device_count(self) -> int:
        return len(jax.devices())

    def device(self, index: int | None = None):
        devices = jax.devices()
        i = self._device_index if index is None else index
        if i >= len(devices):
            raise IndexError(f"device {i} out of range ({len(devices)} devices)")
        return devices[i]

    def set_device(self, index: int) -> None:
        self.device(index)  # validate
        self._device_index = index

    def current_device(self) -> int:
        return self._device_index

    def device_properties(self, index: int = 0) -> dict:
        d = self.device(index)
        props = {
            "platform": d.platform,
            "device_kind": d.device_kind,
            "process_index": d.process_index,
            "id": d.id,
        }
        try:
            stats = d.memory_stats() or {}
            props["bytes_limit"] = stats.get("bytes_limit")
            props["bytes_in_use"] = stats.get("bytes_in_use")
        except Exception:
            pass
        return props

    # -- launches ----------------------------------------------------------

    def sync(self, value) -> None:
        """Force completion with a 1-element device fetch PER LEAF
        (reliable even under relayed dispatch where block_until_ready
        returns early; fetching only the first leaf could under-measure
        multi-output programs whose other outputs were still in flight)."""
        leaves = jax.tree_util.tree_leaves(value)
        if leaves:
            jax.device_get([jax.numpy.ravel(leaf)[:1] for leaf in leaves])

    def submit(self, fn, *args, name: str | None = None):
        """Run a compiled callable under the current sync/profiling policy."""
        if self.profiling_mode:
            from ..utils.profiling import PROFILER

            t0 = time.perf_counter()
            out = fn(*args)
            self.sync(out)
            PROFILER.record(name or getattr(fn, "__name__", "launch"), time.perf_counter() - t0)
            return out
        out = fn(*args)
        if self.sync_mode:
            self.sync(out)
        return out

    def set_sync_mode(self, value: bool) -> None:
        self.sync_mode = bool(value)

    def set_profiling_mode(self, value: bool) -> None:
        self.profiling_mode = bool(value)
        from ..utils.profiling import PROFILER

        PROFILER.enabled = bool(value)
