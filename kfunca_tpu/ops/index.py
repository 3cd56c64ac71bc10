"""index_put_: scatter values at int64 coordinate tensors.

Rebuild of the reference index-put path (index_ops.cpp:6-38 builds a
0-stride view over the index shape; tensor_index.h:56-104 accumulates
per-operand offsets with negative-index wrap).  TPU-natively this is a flat
scatter: linear addresses are computed from the view's strides and the op
lowers to one donated XLA scatter, updating the storage in place at the HBM
level.

Semantics (torch-compatible, as exercised by test_tensor.py:273-284):
index tensors broadcast together and address the first len(indices) dims;
any remaining dims are written as whole slices; values broadcast to the
result shape; negative indices wrap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import ScalarType
from ..core.iterator import check
from ..core.tensor import Tensor
from ..runtime.launcher import Launcher


@partial(jax.jit, static_argnums=(3, 4, 5), donate_argnums=(0,))
def _index_put_jit(buf, idx_list, values, shape, strides, offset):
    k = len(idx_list)
    bshape = jnp.broadcast_shapes(*[i.shape for i in idx_list]) if idx_list else ()
    lin = jnp.full(bshape, offset, dtype=jnp.int64)
    for d, idx in enumerate(idx_list):
        idx = idx.astype(jnp.int64)
        idx = jnp.where(idx < 0, idx + shape[d], idx)  # negative-index wrap
        lin = lin + jnp.broadcast_to(idx, bshape) * strides[d]
    # remaining (sliced) dims
    rest = shape[k:]
    if rest:
        lin = lin.reshape(bshape + (1,) * len(rest))
        for j, n in enumerate(rest):
            iota = lax.broadcasted_iota(jnp.int64, bshape + tuple(rest), len(bshape) + j)
            lin = lin + iota * strides[k + j]
    target_shape = bshape + tuple(rest)
    vals = jnp.broadcast_to(values.astype(buf.dtype), target_shape)
    return buf.at[jnp.ravel(lin)].set(vals.reshape(-1))


def index_put_(self: Tensor, indices, values: Tensor) -> Tensor:
    check(len(indices) <= self.dim(), "index_put_: too many index tensors")
    for i in indices:
        check(i.dtype() == ScalarType.Long, "index_put_: indices must be int64")
        check(i.device() == self.device(), "index_put_: device mismatch")
    check(values.device() == self.device(), "index_put_: device mismatch")
    impl = self.impl()
    # donated scatter, funneled through the Launcher (sync/profiling observe)
    new_buf = Launcher.instance().submit(
        _index_put_jit,
        impl.storage.read(),
        tuple(i._array() for i in indices),
        values._array(),
        impl.shape,
        impl.strides,
        impl.offset,
        name="index_put_",
    )
    impl.storage.write(new_buf)
    return self
