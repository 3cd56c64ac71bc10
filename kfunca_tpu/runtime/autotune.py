"""Per-chip kernel block-size autotuning cache (ROADMAP item 10).

The reference adapts launch geometry per GPU at runtime
(get_adaptive_config, /root/reference/src/device/utils/welford_norm.h:25-56);
the TPU analog is block-shape selection per (op, shape-class, dtype, chip):

  * a JSON cache persisted next to the compile cache (or
    KFUNCA_AUTOTUNE_CACHE) records the best-measured blocks per key;
  * `autotune_defaults.json` ships swept v5e entries as the checked-in
    baseline; the user cache overlays it;
  * bench.py SEEDS the cache: its interleaved block sweeps call record()
    with the winner, so the second run on the same chip starts from
    measured blocks instead of hard-coded constants;
  * kernels consult lookup() at dispatch/trace time — a later record()
    affects new compilations, not already-compiled programs (the same
    contract as every other static argument).
"""

from __future__ import annotations

import json
import os
import threading

import jax

_LOCK = threading.Lock()
_CACHE: dict | None = None
_DEFAULTS: dict | None = None


def chip_name() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "-")
    except Exception:
        return "unknown"


def cache_path() -> str:
    p = os.environ.get("KFUNCA_AUTOTUNE_CACHE")
    if p:
        return p
    d = jax.config.jax_compilation_cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(d, "kfunca_autotune.json")


def _load() -> None:
    global _CACHE, _DEFAULTS
    if _DEFAULTS is None:
        pkg = os.path.join(os.path.dirname(__file__), "autotune_defaults.json")
        try:
            with open(pkg) as f:
                _DEFAULTS = json.load(f)
        except Exception:
            _DEFAULTS = {}
    if _CACHE is None:
        try:
            with open(cache_path()) as f:
                _CACHE = json.load(f)
        except Exception:
            _CACHE = {}


def shape_bucket(*dims: int) -> str:
    """Power-of-two shape class: 4096x4000x4096 and 4096^3 share blocks."""
    out = []
    for d in dims:
        d = int(d)
        out.append(str(1 << max(0, (d - 1).bit_length())) if d > 0 else "0")
    return "x".join(out)


def _key(op: str, shape_class: str, dtype) -> str:
    return f"{chip_name()}|{op}|{shape_class}|{dtype}"


def lookup(op: str, shape_class: str, dtype) -> dict | None:
    """Best-known block params for this (chip, op, shape-class, dtype), or
    None.  The measured user cache overlays the shipped defaults."""
    with _LOCK:
        _load()
        k = _key(op, shape_class, str(dtype))
        hit = _CACHE.get(k)
        return dict(hit) if hit is not None else (
            dict(_DEFAULTS[k]) if k in _DEFAULTS else None
        )


def record(op: str, shape_class: str, dtype, params: dict) -> None:
    """Persist measured-best params (bench.py's sweeps call this)."""
    with _LOCK:
        _load()
        _CACHE[_key(op, shape_class, str(dtype))] = dict(params)
        p = cache_path()
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_CACHE, f, indent=1, sort_keys=True)
        os.replace(tmp, p)
