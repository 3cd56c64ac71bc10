"""Caching device allocator (TPU-native analog of the reference's
DeviceAllocator, /root/reference/src/core/device_allocator.cpp:37-78 and
include/device_allocator.h:48-57).

On TPU, HBM is owned by the XLA runtime, so "allocating device memory"
means holding `jax.Array` buffers alive.  The TPU-native equivalent of the
reference's caching pool is therefore:

  * the same size-class bookkeeping (pools bounded at 4K/64K/256K/1M/4M/
    64M/256M/inf, 1KB alignment, best-fit reuse) over *logical blocks*, and
  * a buffer-recycling registry: when a Storage dies, its backing jax.Array
    is parked on the block; a later allocation of a matching (numel, dtype)
    hands the parked buffer back as uninitialized memory, exactly like the
    reference returning a pooled cudaMalloc'd block from `allocate`.

The bookkeeping core is implemented in C++ (runtime/_native) with this
Python implementation as a behavior-identical fallback; both are covered by
tests/test_allocator.py (port of reference test/core/test_device_allocator.cpp).

The reference's latent bug — erasing the pool-set iterator before reading it
(device_allocator.cpp:56-60) — is deliberately not reproduced.
"""

from __future__ import annotations

import ctypes
import itertools
import threading
from dataclasses import dataclass
from typing import Optional

ALIGNMENT = 1024
# Upper byte-bounds of the size-class pools (reference device_allocator.h:48-57).
POOL_BOUNDS = [
    4 * 1024,
    64 * 1024,
    256 * 1024,
    1024 * 1024,
    4 * 1024 * 1024,
    64 * 1024 * 1024,
    256 * 1024 * 1024,
    float("inf"),
]

# Each live block gets a disjoint 1TiB logical address window so that
# data_ptr() arithmetic (base + offset * itemsize) never collides across
# storages. TPU HBM pointers are not exposed by the runtime, so pointers are
# logical; stability across in-place ops is what the API contract requires
# (reference test/test_tensor.py:29-68).
_ADDR_STRIDE = 1 << 40


def _round_up(n: int, align: int) -> int:
    return ((n + align - 1) // align) * align


def _pool_index(nbytes: int) -> int:
    for i, bound in enumerate(POOL_BOUNDS):
        if nbytes <= bound:
            return i
    return len(POOL_BOUNDS) - 1


@dataclass
class Block:
    block_id: int
    size: int  # rounded-up byte size
    device: int
    addr: int
    # Parked device buffer from the storage that previously owned this block
    # (None until the block has been freed once with a recyclable buffer).
    buffer: object = None
    buffer_meta: Optional[tuple] = None  # (numel, dtype) of parked buffer
    in_use: bool = True


class DeviceAllocator:
    """Singleton caching allocator: size-class pools with best-fit reuse.

    Bookkeeping runs in the native C++ core (csrc/kfunca_core.cpp) when the
    toolchain built it; this class is the behavior-identical Python fallback
    and, in native mode, holds the parked jax.Array buffers (device handles
    cannot cross the C ABI)."""

    _instance = None
    _instance_lock = threading.Lock()

    def __init__(self):
        self._lock = threading.Lock()
        self._next_id = itertools.count(1)
        # device -> pool_index -> list[Block] (kept sorted by size)
        self._pools: dict[int, list[list[Block]]] = {}
        self._live: dict[int, Block] = {}
        self._bytes_in_use = 0
        self._bytes_pooled = 0
        self._alloc_count = 0
        self._reuse_count = 0
        # native mode: block_id -> parked (buffer, meta) of freed storages
        self._parked: dict[int, tuple] = {}
        from . import _native

        self._lib = _native.get_lib()

    @classmethod
    def instance(cls) -> "DeviceAllocator":
        # lock-free fast path (eager dispatch calls this 2-3x per op; the
        # CPython attribute read is atomic, construction stays locked)
        inst = cls._instance
        if inst is not None:
            return inst
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def _device_pools(self, device: int) -> list[list[Block]]:
        if device not in self._pools:
            self._pools[device] = [[] for _ in POOL_BOUNDS]
        return self._pools[device]

    def allocate(self, nbytes: int, device: int = 0) -> Block:
        """Best-fit allocation from the size-class pool, else a fresh block
        (reference device_allocator.cpp:37-55)."""
        nbytes = max(int(nbytes), 1)
        rounded = _round_up(nbytes, ALIGNMENT)
        if self._lib is not None:
            size = ctypes.c_int64()
            reused = ctypes.c_int()
            bid = self._lib.kf_allocate(
                device, nbytes, ctypes.byref(size), ctypes.byref(reused)
            )
            blk = Block(
                block_id=bid,
                size=size.value,
                device=device,
                # kf_block_addr(bid) == bid << 40 (csrc kAddrStride); computed
                # here to save an FFI crossing on the allocation hot path
                addr=bid << 40,
            )
            if reused.value:
                with self._lock:
                    parked = self._parked.pop(bid, None)
                if parked is not None:
                    blk.buffer, blk.buffer_meta = parked
            return blk
        with self._lock:
            pool = self._device_pools(device)[_pool_index(rounded)]
            # best fit: smallest pooled block >= rounded (pool kept sorted)
            for i, blk in enumerate(pool):
                if blk.size >= rounded:
                    pool.pop(i)
                    blk.in_use = True
                    self._bytes_pooled -= blk.size
                    self._bytes_in_use += blk.size
                    self._reuse_count += 1
                    self._live[blk.block_id] = blk
                    return blk
            bid = next(self._next_id)
            blk = Block(block_id=bid, size=rounded, device=device, addr=bid * _ADDR_STRIDE)
            self._alloc_count += 1
            self._bytes_in_use += blk.size
            self._live[bid] = blk
            return blk

    def free(self, block: Block, buffer=None, buffer_meta=None) -> None:
        """Return a block to its pool; never released back to the platform
        until process exit (reference device_allocator.cpp:66-72).  An
        optionally parked device buffer enables zero-copy reuse."""
        if self._lib is not None:
            if self._lib.kf_free(block.block_id) == 0 and buffer is not None:
                with self._lock:
                    self._parked[block.block_id] = (buffer, buffer_meta)
            return
        with self._lock:
            if not block.in_use:
                return
            block.in_use = False
            block.buffer = buffer
            block.buffer_meta = buffer_meta
            self._live.pop(block.block_id, None)
            self._bytes_in_use -= block.size
            self._bytes_pooled += block.size
            pool = self._device_pools(block.device)[_pool_index(block.size)]
            pool.append(block)
            pool.sort(key=lambda b: b.size)

    def take_recycled_buffer(self, block: Block, numel: int, dtype) -> object:
        """Hand back the parked buffer if it matches (numel, dtype); the
        buffer's contents are treated as uninitialized memory."""
        if block.buffer is not None and block.buffer_meta == (numel, dtype):
            buf, block.buffer, block.buffer_meta = block.buffer, None, None
            return buf
        block.buffer, block.buffer_meta = None, None
        return None

    # -- observability (reference memstat: device_allocator.cpp:17-35) -----

    def stats(self) -> dict:
        if self._lib is not None:
            import ctypes

            out = (ctypes.c_int64 * 5)()
            self._lib.kf_alloc_stats(out)
            devs = (ctypes.c_int32 * 64)()
            n_dev = min(self._lib.kf_alloc_devices(devs, 64), 64)
            pools = {}
            for di in range(n_dev):
                per = (ctypes.c_int64 * 16)()
                self._lib.kf_alloc_pool_stats(devs[di], per)
                pools[int(devs[di])] = [
                    {"bound": bound, "blocks": int(per[2 * i]),
                     "bytes": int(per[2 * i + 1])}
                    for i, bound in enumerate(POOL_BOUNDS)
                ]
            return {
                "bytes_in_use": out[0],
                "bytes_pooled": out[1],
                "live_blocks": out[2],
                "fresh_allocs": out[3],
                "pool_reuses": out[4],
                "pools": pools,
                "native": True,
            }
        with self._lock:
            pools = {}
            for device, dpools in self._pools.items():
                pools[device] = [
                    {"bound": bound, "blocks": len(p), "bytes": sum(b.size for b in p)}
                    for bound, p in zip(POOL_BOUNDS, dpools)
                ]
            return {
                "bytes_in_use": self._bytes_in_use,
                "bytes_pooled": self._bytes_pooled,
                "live_blocks": len(self._live),
                "fresh_allocs": self._alloc_count,
                "pool_reuses": self._reuse_count,
                "pools": pools,
            }

    def print(self) -> None:
        s = self.stats()
        print("=== kfunca_tpu memstat ===")
        print(f"bytes in use   : {s['bytes_in_use']}")
        print(f"bytes pooled   : {s['bytes_pooled']}")
        print(f"live blocks    : {s['live_blocks']}")
        print(f"fresh allocs   : {s['fresh_allocs']}")
        print(f"pool reuses    : {s['pool_reuses']}")
        for device, pools in s["pools"].items():
            for entry in pools:
                if entry["blocks"]:
                    print(
                        f"device {device} pool<= {entry['bound']}: "
                        f"{entry['blocks']} blocks, {entry['bytes']} bytes"
                    )


def memstat() -> None:
    DeviceAllocator.instance().print()
