"""Typed device storage over a flat jax.Array buffer.

TPU-native analog of the reference TensorStorage
(/root/reference/src/core/include/tensor_impl.h:62-92): a refcounted,
allocator-backed span of device memory.  Here the span is a flat 1-D
jax.Array living in HBM, and the allocator provides logical addresses +
buffer recycling (see runtime/allocator.py).

`buffer is None` means "allocated but uninitialized" — the TPU equivalent of
cudaMalloc'd memory that was never written.  Reads of uninitialized storage
materialize zeros; first writes skip the zero-fill entirely, which makes the
reference's `empty_like().fill_()` pattern allocation-cheap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..runtime.allocator import DeviceAllocator
from .dtype import ScalarType, element_size, to_jnp


def jax_device(index: int):
    devices = jax.devices()
    if index >= len(devices):
        raise IndexError(f"device index {index} out of range ({len(devices)} devices)")
    return devices[index]


class Storage:
    __slots__ = ("numel", "dtype", "device", "block", "buffer", "__weakref__")

    def __init__(
        self,
        numel: int,
        dtype: ScalarType,
        device: int = 0,
        buffer=None,
        recycle: bool = True,
    ):
        self.numel = int(numel)
        self.dtype = dtype
        self.device = device
        nbytes = max(self.numel, 1) * element_size(dtype)
        self.block = DeviceAllocator.instance().allocate(nbytes, device)
        if buffer is not None:
            self.buffer = buffer
        elif recycle:
            # Zero-copy recycle of a parked buffer with matching (numel, dtype).
            self.buffer = DeviceAllocator.instance().take_recycled_buffer(
                self.block, self.numel, dtype
            )
        else:
            # Caller requires never-written semantics (zeros): a parked
            # buffer holds the PREVIOUS storage's contents, so adopting it
            # would violate the lazy-zero contract of read().  Discard any
            # parked buffer and leave the storage uninitialized (reference
            # memsets instead, tensor.cpp:62-69; here the zero-fill stays
            # lazy but is now guaranteed).
            DeviceAllocator.instance().take_recycled_buffer(self.block, -1, None)
            self.buffer = None

    # -- device data -------------------------------------------------------

    def read(self) -> jax.Array:
        """Flat device buffer; materializes zeros on first read of
        uninitialized storage."""
        if self.buffer is None:
            self.buffer = jnp.zeros(
                (self.numel,), dtype=to_jnp(self.dtype), device=jax_device(self.device)
            )
        return self.buffer

    def write(self, flat: jax.Array) -> None:
        """Replace the whole buffer. Callers scatter/update-slice for partial
        writes; the storage object (and its logical address) is stable."""
        assert flat.ndim == 1 and flat.shape[0] == self.numel, (flat.shape, self.numel)
        self.buffer = flat

    @property
    def base_ptr(self) -> int:
        return self.block.addr

    def ref_initialized(self) -> bool:
        return self.buffer is not None

    def __del__(self):
        try:
            meta = (self.numel, self.dtype) if self.buffer is not None else None
            DeviceAllocator.instance().free(
                self.block, buffer=self.buffer, buffer_meta=meta
            )
        except Exception:
            pass  # interpreter teardown
