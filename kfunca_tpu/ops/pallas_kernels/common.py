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


# ---------------------------------------------------------------------------
# Block-picker guard rails (VERDICT r4 #9).
#
# The kernel family's VMEM working sets fall in two classes:
#   * block-bounded (flash FORWARD, paged decode, reduce, welford): scratch
#     is O(block), independent of sequence length — any S fits, the picker
#     only needs tile alignment (pick_block above).
#   * sequence-bounded (flash fused BACKWARD): dq/lse/delta accumulators are
#     O(Sq_padded) VMEM residents (flash_attention.py scratch_shapes), so S
#     itself is capped:  bytes ~= sqp*(dp + 256)*4  + block operands.  On
#     v5e (~128 MiB VMEM/core, 100 MiB budget below) that binds at
#     s ~= 48k for d=128 and s ~= 24k for d=256; s=32k d<=128 fits (the
#     BENCH attn_s32k row).  Beyond the cap the right tool is context
#     parallelism (parallel/ring.py ring attention), not a bigger block —
#     assert_vmem_fits raises with that pointer instead of letting Mosaic
#     fail with an opaque allocation error.
# ---------------------------------------------------------------------------
VMEM_BUDGET_BYTES = 100 * 1024 * 1024  # matches CompilerParams vmem_limit


def assert_vmem_fits(nbytes: int, what: str) -> None:
    if nbytes > VMEM_BUDGET_BYTES:
        from ...utils.errors import KfError
        raise KfError(
            f"{what}: VMEM working set {nbytes / 2**20:.0f} MiB exceeds the "
            f"{VMEM_BUDGET_BYTES / 2**20:.0f} MiB per-core budget. For longer "
            "sequences shard the sequence axis instead (ring attention, "
            "parallel/ring.py / mesh cp), or reduce head_dim/block sizes."
        )


# Min sublane alignment by dtype (TPU tiling: (sublane, 128) tiles).
def sublane_align(dtype) -> int:
    if dtype in (jnp.bfloat16, jnp.float16):
        return 16
    if dtype in (jnp.int8, jnp.uint8):
        return 32
    return 8
