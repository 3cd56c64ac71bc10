"""Shared helpers for the Pallas TPU kernel family."""

from __future__ import annotations

import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_to(x, shape):
    """Zero-pad trailing edges of x up to `shape` (no-op when already there)."""
    pads = [(0, t - s) for s, t in zip(x.shape, shape)]
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads)


def pick_block(dim: int, preferred: int, align: int = 128) -> int:
    """Choose a block size: the preferred tile for large dims, otherwise the
    whole (tile-aligned) dim so tiny problems stay single-block."""
    if dim >= preferred:
        return preferred
    return round_up(max(dim, 1), align)


# Min sublane alignment by dtype (TPU tiling: (sublane, 128) tiles).
def sublane_align(dtype) -> int:
    if dtype in (jnp.bfloat16, jnp.float16):
        return 16
    if dtype in (jnp.int8, jnp.uint8):
        return 32
    return 8
