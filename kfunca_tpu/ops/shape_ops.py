"""Shape ops: concat (tensor_split lives on Tensor.split).

The reference implements concat as alloc + narrow + copy_ per input
(tensor_shape.cpp:41-70); here the same result is one fused XLA concatenate
over layout-normalized inputs.  Output dtype follows the first input, with
copy_-style dynamic casting of the rest (the reference's copy_ kernels cast).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.dtype import to_jnp
from ..core.iterator import check, maybe_wrap_dim
from ..core.tensor import Tensor, empty
from ..runtime.launcher import Launcher


@partial(jax.jit, static_argnums=(0, 1))
def _concat_jit(dim, out_dt, *arrs):
    return jnp.concatenate([a.astype(out_dt) for a in arrs], axis=dim)


def concat(tensors, dim: int) -> Tensor:
    check(len(tensors) >= 1, "cat: need at least one tensor")
    first = tensors[0]
    dim = maybe_wrap_dim(dim, first.dim())
    total = 0
    for t in tensors:
        check(t.dim() == first.dim(), "cat: rank mismatch")
        check(t.device() == first.device(), "cat: device mismatch")
        for d in range(first.dim()):
            if d != dim:
                check(t.shape(d) == first.shape(d), "cat: shape mismatch off-dim")
        total += t.shape(dim)
    out_shape = first.sizes()
    out_shape[dim] = total
    out = empty(out_shape, first.dtype(), first.device())
    # one fused program (casts + concatenate), funneled through the Launcher
    arrs = [t._array() for t in tensors]
    out._write(
        Launcher.instance().submit(_concat_jit, dim, to_jnp(first.dtype()), *arrs, name="cat")
    )
    return out
