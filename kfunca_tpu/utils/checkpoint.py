"""Checkpoint / resume: save and restore param pytrees and eager Tensors.

Green-field capability — the reference has NO serialization beyond
to_numpy (SURVEY.md §5); its de-facto export path is preserved here and
extended into a real checkpoint format: a single .npz holding flattened
pytree leaves plus a JSON treedef manifest, so a training run (params +
optimizer state + step counter) round-trips losslessly, and eager Tensors
save with dtype fidelity (incl. bf16).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

_MANIFEST_KEY = "__kfunca_manifest__"


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path: str, tree) -> None:
    """Save any pytree of arrays (jax/numpy) or kfunca Tensors to `path`."""
    from ..core.tensor import Tensor

    def to_host(x):
        if isinstance(x, Tensor):
            return {"__tensor__": True, "data": x.contiguous().numpy()}
        return np.asarray(x)

    mapped = jax.tree_util.tree_map(to_host, tree, is_leaf=lambda x: isinstance(x, Tensor))
    flat, treedef = jax.tree_util.tree_flatten(
        mapped, is_leaf=lambda x: isinstance(x, dict) and x.get("__tensor__")
    )
    arrays, kinds, dtypes = [], [], []
    for leaf in flat:
        if isinstance(leaf, dict) and leaf.get("__tensor__"):
            arr, kind = leaf["data"], "tensor"
        else:
            arr, kind = np.asarray(leaf), "array"
        dtypes.append(arr.dtype.name)
        if arr.dtype.name == "bfloat16":  # npz has no bf16: store raw bits
            arr = arr.view(np.uint16)
        arrays.append(arr)
        kinds.append(kind)
    manifest = {"treedef": str(treedef), "kinds": kinds, "dtypes": dtypes, "version": 1}
    payload = {f"leaf_{i}": a for i, a in enumerate(arrays)}
    payload[_MANIFEST_KEY] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)  # atomic: a crash never corrupts the checkpoint


def load(path: str, like=None, device: int = 0):
    """Restore a checkpoint.

    `like` (optional) is a pytree with the target structure; when given, the
    result mirrors its structure and leaf types (kfunca Tensors come back as
    Tensors on `device`, jax arrays as jax arrays with their dtype).
    Without `like`, returns a flat list of numpy arrays.
    """
    import jax.numpy as jnp

    from ..core.tensor import Tensor, from_numpy

    import ml_dtypes

    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(bytes(z[_MANIFEST_KEY]).decode())
        arrays = []
        for i, dtype_name in enumerate(manifest["dtypes"]):
            arr = z[f"leaf_{i}"]
            if dtype_name == "bfloat16":
                arr = arr.view(ml_dtypes.bfloat16)
            arrays.append(arr)
    if like is None:
        return arrays
    flat_like, treedef = jax.tree_util.tree_flatten(
        like, is_leaf=lambda x: isinstance(x, Tensor)
    )
    if len(flat_like) != len(arrays):
        raise ValueError(
            f"checkpoint has {len(arrays)} leaves, target structure has {len(flat_like)}"
        )
    out = []
    for proto, arr in zip(flat_like, arrays):
        if isinstance(proto, Tensor):
            out.append(from_numpy(arr, device))
        else:
            out.append(jnp.asarray(arr, dtype=proto.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)
