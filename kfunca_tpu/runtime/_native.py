"""Loader/builder for the native C++ runtime core (csrc/kfunca_core.cpp).

Builds libkfunca_core.so with g++ on first import (cached next to the
source; rebuilt when the source is newer).  pybind11 is unavailable in this
image, so the ABI is plain C consumed via ctypes.

If no C++ toolchain is present the framework falls back to the
behavior-identical Python implementations; tests/test_native_core.py
enforces parity between the two.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LIB = None
_LOCK = threading.Lock()
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_SRC = os.path.join(_CSRC, "kfunca_core.cpp")
_SO = os.path.join(_CSRC, "libkfunca_core.so")


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        cmd = [
            "g++",
            "-O2",
            "-std=c++17",
            "-shared",
            "-fPIC",
            "-fvisibility=hidden",
            _SRC,
            "-o",
            _SO + ".tmp",
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64, i64p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
    i8, i32p = ctypes.c_int8, ctypes.POINTER(ctypes.c_int)
    lib.kf_allocate.restype = i64
    lib.kf_allocate.argtypes = [ctypes.c_int, i64, i64p, i32p]
    lib.kf_free.restype = ctypes.c_int
    lib.kf_free.argtypes = [i64]
    lib.kf_block_addr.restype = i64
    lib.kf_block_addr.argtypes = [i64]
    lib.kf_alloc_stats.restype = None
    lib.kf_alloc_stats.argtypes = [i64p]
    lib.kf_alloc_reset.restype = None
    lib.kf_alloc_reset.argtypes = []
    lib.kf_alloc_devices.restype = ctypes.c_int
    lib.kf_alloc_devices.argtypes = [i32p, ctypes.c_int]
    lib.kf_alloc_pool_stats.restype = None
    lib.kf_alloc_pool_stats.argtypes = [ctypes.c_int, i64p]
    lib.kf_promote.restype = i8
    lib.kf_promote.argtypes = [i8, i8]
    lib.kf_accumulate_type.restype = i8
    lib.kf_accumulate_type.argtypes = [i8]
    lib.kf_broadcast_shapes.restype = ctypes.c_int
    lib.kf_broadcast_shapes.argtypes = [ctypes.c_int, i64p, i64p, i64p, i64p]
    lib.kf_plan_loop_nest.restype = ctypes.c_int
    lib.kf_plan_loop_nest.argtypes = [ctypes.c_int, i64, i64p, i64p, i64p, i64p, i64p, i64p]
    lib.kf_tape_schedule.restype = ctypes.c_int
    lib.kf_tape_schedule.argtypes = [i64, i64, i64p, i64p, i64, i64p]
    # serving runtime: page allocator + request queue
    lib.kf_page_pool_create.restype = i64
    lib.kf_page_pool_create.argtypes = [i64]
    lib.kf_page_alloc.restype = i64
    lib.kf_page_alloc.argtypes = [i64, i64, i64p]
    lib.kf_page_free.restype = i64
    lib.kf_page_free.argtypes = [i64, i64, i64p]
    lib.kf_page_pool_available.restype = i64
    lib.kf_page_pool_available.argtypes = [i64]
    lib.kf_queue_create.restype = i64
    lib.kf_queue_create.argtypes = []
    lib.kf_queue_push.restype = i64
    lib.kf_queue_push.argtypes = [i64, i64]
    lib.kf_queue_pop.restype = i64
    lib.kf_queue_pop.argtypes = [i64]
    lib.kf_queue_size.restype = i64
    lib.kf_queue_size.argtypes = [i64]
    i32p = ctypes.POINTER(ctypes.c_int32)
    for fn in (lib.kf_fwd_live_tables, lib.kf_bwd_live_tables):
        fn.restype = i64
        fn.argtypes = [i64, i64, i64, i64, i32p, i32p, i32p]
    # serving prefix-cache: chained page hashing + LRU hash index
    u64, u64p = ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64)
    lib.kf_pcache_create.restype = i64
    lib.kf_pcache_create.argtypes = []
    lib.kf_pcache_destroy.restype = None
    lib.kf_pcache_destroy.argtypes = [i64]
    lib.kf_pcache_hash_chain.restype = i64
    lib.kf_pcache_hash_chain.argtypes = [i32p, i64, i64, i64, u64p]
    lib.kf_pcache_get.restype = i64
    lib.kf_pcache_get.argtypes = [i64, u64, u64]
    lib.kf_pcache_touch.restype = i64
    lib.kf_pcache_touch.argtypes = [i64, u64, u64]
    lib.kf_pcache_put.restype = i64
    lib.kf_pcache_put.argtypes = [i64, u64, u64, i64]
    lib.kf_pcache_erase.restype = i64
    lib.kf_pcache_erase.argtypes = [i64, u64, u64]
    lib.kf_pcache_size.restype = i64
    lib.kf_pcache_size.argtypes = [i64]
    lib.kf_pcache_lru.restype = i64
    lib.kf_pcache_lru.argtypes = [i64, u64p, i64p, i64]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32 = ctypes.c_int32
    i32p_ = ctypes.POINTER(ctypes.c_int32)
    lib.kf_bpe_create.restype = i64
    lib.kf_bpe_destroy.argtypes = [i64]
    lib.kf_bpe_add_merge.restype = i64
    lib.kf_bpe_add_merge.argtypes = [i64, i32, i32, i32]
    lib.kf_bpe_encode.restype = i64
    lib.kf_bpe_encode.argtypes = [i64, u8p, i64, i32p_]
    lib.kf_bpe_decode.restype = i64
    lib.kf_bpe_decode.argtypes = [i64, i32p_, i64, u8p, i64]
    lib.kf_bpe_vocab_size.restype = i64
    lib.kf_bpe_vocab_size.argtypes = [i64]
    return lib


def get_lib():
    """The native library, or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _TRIED:
            _TRIED = True
            if os.environ.get("KFUNCA_NO_NATIVE", "0") != "1" and _build():
                try:
                    _LIB = _bind(ctypes.CDLL(_SO))
                except OSError:
                    _LIB = None
    return _LIB


def i64_array(values):
    return (ctypes.c_int64 * len(values))(*values)
