"""Checkpoint / resume: save and restore param pytrees and eager Tensors.

Green-field capability — the reference has NO serialization beyond
to_numpy (SURVEY.md §5); its de-facto export path is preserved here and
extended into a real checkpoint format: a single .npz holding flattened
pytree leaves plus a JSON treedef manifest, so a training run (params +
optimizer state + step counter) round-trips losslessly, and eager Tensors
save with dtype fidelity (incl. bf16).

Sharded checkpoints (save_sharded/load_sharded) write one shard file per
process containing only the process's ADDRESSABLE shards of each sharded
jax.Array (plus a JSON manifest with global shapes and shard slices); on
restore the shards are reassembled and device_put with the target tree's
shardings, so a dp x tp x pp training state round-trips without ever
materializing replicated copies per device.  save_async moves the
device->host fetch onto the caller (blocking, cheap on ICI-attached hosts)
and the file write onto a background thread — training resumes while the
bytes land on disk.
"""

from __future__ import annotations

import json
import os
import threading

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

# ---------------------------------------------------------------------------
# sharded checkpoints (per-process shard files) + async save
# ---------------------------------------------------------------------------


def _slice_to_json(index, shape):
    """Serialize a per-shard index (tuple of slices) as [[start, stop], ...]."""
    out = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append([start, stop])
    return out


def save_sharded(dir_path: str, tree) -> None:
    """Save a pytree of (possibly sharded) jax arrays as a sharded
    checkpoint directory:

        dir_path/manifest.json       treedef + per-leaf shape/dtype
        dir_path/shard_<proc>.npz    this process's addressable shards

    Each process writes only its own file (multi-host safe: no cross-host
    traffic); every addressable shard of every leaf is recorded with its
    global slice, deduplicated per device so replicated leaves are written
    once per process.
    """
    os.makedirs(dir_path, exist_ok=True)
    flat, treedef = jax.tree_util.tree_flatten(tree)
    leaves_meta = []
    payload = {}
    shard_records = []
    for i, leaf in enumerate(flat):
        arr = leaf
        if not isinstance(arr, jax.Array):
            arr = jax.numpy.asarray(arr)
        leaves_meta.append({"shape": list(arr.shape), "dtype": str(arr.dtype)})
        seen = set()
        for shard in arr.addressable_shards:
            key = tuple(map(tuple, _slice_to_json(shard.index, arr.shape)))
            if key in seen:  # replicated shard: store once
                continue
            seen.add(key)
            name = f"leaf{i}_s{len(shard_records)}"
            data = np.asarray(shard.data)
            if data.dtype.name == "bfloat16":
                data = data.view(np.uint16)
            payload[name] = data
            shard_records.append(
                {"leaf": i, "name": name, "slice": _slice_to_json(shard.index, arr.shape)}
            )
    manifest = {
        "version": 1,
        "treedef": str(treedef),
        "leaves": leaves_meta,
        "process": jax.process_index(),
    }
    proc = jax.process_index()
    shard_manifest = {"shards": shard_records}
    tmp = os.path.join(dir_path, f"shard_{proc}.npz.tmp")
    with open(tmp, "wb") as f:
        np.savez(
            f,
            **payload,
            __shard_manifest__=np.frombuffer(
                json.dumps(shard_manifest).encode(), dtype=np.uint8
            ),
        )
    os.replace(tmp, os.path.join(dir_path, f"shard_{proc}.npz"))
    if proc == 0:
        mtmp = os.path.join(dir_path, "manifest.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(dir_path, "manifest.json"))


def load_sharded(dir_path: str, like):
    """Restore a sharded checkpoint.

    `like` supplies both the pytree structure and the target shardings:
    leaves that are sharded jax.Arrays come back device_put with the SAME
    sharding (reassembled from whichever shard files are present); other
    leaves come back as plain jax arrays with `like`'s dtype.
    """
    import glob

    import jax.numpy as jnp
    import ml_dtypes

    with open(os.path.join(dir_path, "manifest.json")) as f:
        manifest = json.load(f)
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    if len(flat_like) != len(manifest["leaves"]):
        raise ValueError(
            f"checkpoint has {len(manifest['leaves'])} leaves, target has {len(flat_like)}"
        )
    # assemble each leaf from all available shard files
    assembled = []
    for meta in manifest["leaves"]:
        dt = meta["dtype"]
        np_dt = ml_dtypes.bfloat16 if dt == "bfloat16" else np.dtype(dt)
        assembled.append(np.zeros(meta["shape"], np_dt))
    # per-element coverage masks, NOT element counts: in multi-host layouts a
    # leaf can be replicated across some processes and sharded across others,
    # so duplicate copies of one shard could push a raw count to arr.size
    # while another shard's region is missing — a count check would silently
    # restore that region as zeros
    covered = [np.zeros(a.shape, dtype=bool) for a in assembled]
    for path in sorted(glob.glob(os.path.join(dir_path, "shard_*.npz"))):
        with np.load(path, allow_pickle=False) as z:
            sm = json.loads(bytes(z["__shard_manifest__"]).decode())
            for rec in sm["shards"]:
                data = z[rec["name"]]
                if manifest["leaves"][rec["leaf"]]["dtype"] == "bfloat16":
                    data = data.view(ml_dtypes.bfloat16)
                idx = tuple(slice(a, b) for a, b in rec["slice"])
                assembled[rec["leaf"]][idx] = data
                covered[rec["leaf"]][idx] = True
    for i, (arr, mask) in enumerate(zip(assembled, covered)):
        n = int(mask.sum())
        if n < arr.size:
            raise ValueError(f"leaf {i}: only {n}/{arr.size} elements covered by shards")
    out = []
    for proto, arr in zip(flat_like, assembled):
        if isinstance(proto, jax.Array) and hasattr(proto, "sharding"):
            out.append(jax.device_put(arr, proto.sharding))
        else:
            out.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, out)


class AsyncCheckpoint:
    """Handle for an in-flight async save; wait() joins the writer thread."""

    def __init__(self, thread: threading.Thread):
        self._thread = thread
        self.error = None

    def wait(self) -> None:
        self._thread.join()
        if self.error is not None:
            raise self.error


def save_async(path: str, tree) -> AsyncCheckpoint:
    """Atomic async save: the device->host fetch happens NOW (so training
    may mutate params immediately after this returns), the file write runs
    on a background thread."""
    from ..core.tensor import Tensor

    def to_host(x):
        if isinstance(x, Tensor):
            return {"__tensor__": True, "data": x.contiguous().numpy()}
        return np.asarray(x)  # blocking D2H

    host_tree = jax.tree_util.tree_map(
        to_host, tree, is_leaf=lambda x: isinstance(x, Tensor)
    )

    handle = None

    def write():
        try:
            save(path, host_tree)
        except Exception as e:  # surfaced on wait()
            handle.error = e

    t = threading.Thread(target=write, daemon=True)
    handle = AsyncCheckpoint(t)
    t.start()
    return handle


# ---------------------------------------------------------------------------
# orbax interop (round 3): ecosystem-standard checkpoint format
# ---------------------------------------------------------------------------


def save_orbax(dir_path: str, tree) -> None:
    """Save a jax pytree in orbax's StandardCheckpointer format — the
    ecosystem interchange path (MaxText/flax tooling reads it).  Eager
    kfunca Tensors are converted to arrays (dtype-preserving); use save()/
    save_sharded() for Tensor-aware native checkpoints."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from ..core.tensor import Tensor

    def to_array(x):
        if isinstance(x, Tensor):
            return jnp.asarray(x.contiguous().numpy())
        return x

    tree = jax.tree_util.tree_map(
        to_array, tree, is_leaf=lambda x: isinstance(x, Tensor)
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(dir_path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(dir_path: str, like):
    """Restore an orbax StandardCheckpointer directory against `like`'s
    structure (shapes/dtypes/shardings from the abstract target)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), like
    )
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(dir_path), abstract)
