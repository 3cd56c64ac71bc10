"""device_info(): device properties + built-in microbenchmarks.

Rebuild of the reference device_info (device_info.cu:135-216): prints the
device properties and then *measures* memory bandwidth (the reference's 1GiB
vectorized-copy GBPS loop) and compute throughput (the FMAD TFLOPS loop).
The TPU equivalents are an HBM copy benchmark and an MXU bf16 matmul
benchmark, timed with block_until_ready (the Launcher-profiling-mode analog).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

# Peak specs per chip generation for roofline context: (bf16 TFLOP/s, HBM GB/s).
# Public numbers from cloud.google.com/tpu/docs/system-architecture.
TPU_PEAKS = {
    "v2": (45, 700),
    "v3": (123, 900),
    "v4": (275, 1228),
    "v5e": (197, 819),
    "v5p": (459, 2765),
    "v6e": (918, 1640),
    "v6": (918, 1640),
}


def _detect_peaks(device) -> tuple:
    kind = getattr(device, "device_kind", "").lower()
    for key, peaks in sorted(TPU_PEAKS.items(), key=lambda kv: -len(kv[0])):
        if key in kind.replace(" ", ""):
            return peaks
    return (0, 0)


def _time_it(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def copy_bandwidth_gbps(nbytes: int = 1 << 28, device=None) -> float:
    """HBM copy benchmark (reference test_threads_copy, device_info.cu:37-86)."""
    n = nbytes // 4
    x = jnp.zeros((n,), dtype=jnp.float32)
    if device is not None:
        x = jax.device_put(x, device)
    copy = jax.jit(lambda a: a * 1.0)
    dt = _time_it(copy, x)
    return 2 * nbytes / dt / 1e9  # read + write


def matmul_tflops(m: int = 4096, dtype=jnp.bfloat16, device=None) -> float:
    """MXU throughput benchmark (reference fmad_loop, device_info.cu:88-129)."""
    a = jnp.ones((m, m), dtype=dtype)
    b = jnp.ones((m, m), dtype=dtype)
    if device is not None:
        a, b = jax.device_put(a, device), jax.device_put(b, device)
    mm = jax.jit(lambda x, y: jnp.matmul(x, y, preferred_element_type=jnp.float32))
    dt = _time_it(mm, a, b)
    return 2 * m * m * m / dt / 1e12


def device_info(run_benchmarks: bool = True) -> None:
    for i, dev in enumerate(jax.devices()):
        print(f"=== device {i} ===")
        print(f"platform      : {dev.platform}")
        print(f"device_kind   : {dev.device_kind}")
        print(f"process_index : {dev.process_index}")
        stats = {}
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            pass
        if stats:
            print(f"hbm bytes     : {stats.get('bytes_limit', 'n/a')}")
            print(f"hbm in use    : {stats.get('bytes_in_use', 'n/a')}")
        peak_tf, peak_bw = _detect_peaks(dev)
        if peak_tf:
            print(f"peak bf16     : {peak_tf} TFLOP/s (theoretical)")
            print(f"peak int8     : {peak_tf * 2} TFLOP/s (theoretical, 2x MXU rate)")
            print(f"peak HBM BW   : {peak_bw} GB/s (theoretical)")
    if run_benchmarks:
        dev = jax.devices()[0]
        small = dev.platform == "cpu"
        bw = copy_bandwidth_gbps(1 << (24 if small else 28), dev)
        print(f"measured copy bandwidth : {bw:.1f} GB/s")
        tf = matmul_tflops(1024 if small else 4096, jnp.bfloat16, dev)
        print(f"measured bf16 matmul    : {tf:.2f} TFLOP/s")
