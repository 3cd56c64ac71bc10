"""Byte-level BPE tokenizer: trainable, native-accelerated, dependency-free.

Green-field capability (the reference has no data/tokenizer layer; its
"data path" is from_numpy, SURVEY.md §0).  Production text serving needs a
host-side tokenizer whose encode/decode is the per-request hot path, so
the apply side runs in the native core (csrc kf_bpe_*, plain-C ABI via
ctypes) with a behavior-identical Python fallback (KFUNCA_NO_NATIVE=1).

Model: token ids 0..255 are the raw bytes; every merge (left, right ->
result) concatenates two existing tokens, so the merge list alone defines
the vocab — no separate vocab file, trivially JSON-serializable, and any
byte string round-trips exactly (no unk token, no normalization).
"""

from __future__ import annotations

import ctypes
import json

import numpy as np


def _lib():
    from ..runtime._native import get_lib

    return get_lib()


class BPETokenizer:
    """merges: ordered list of (left, right, result) with result >= 256."""

    def __init__(self, merges):
        self.merges = [(int(l), int(r), int(t)) for l, r, t in merges]
        self._ranks = {(l, r): (rank, t) for rank, (l, r, t) in enumerate(self.merges)}
        # id -> bytes, built incrementally from the merges
        self._bytes = [bytes([i]) for i in range(256)]
        for l, r, t in self.merges:
            if t != len(self._bytes):
                raise ValueError(f"merge result ids must be dense from 256; got {t}")
            self._bytes.append(self._bytes[l] + self._bytes[r])
        self._handle = None
        lib = _lib()
        if lib is not None:
            h = lib.kf_bpe_create()
            for l, r, t in self.merges:
                if lib.kf_bpe_add_merge(h, l, r, t) < 0:
                    lib.kf_bpe_destroy(h)
                    raise ValueError(f"invalid merge ({l}, {r} -> {t})")
            self._handle = h

    # -- training ------------------------------------------------------------

    @classmethod
    def train(cls, corpus, vocab_size: int) -> "BPETokenizer":
        """Classic BPE training: repeatedly merge the most frequent adjacent
        token pair until vocab_size (>= 256) tokens exist.  Ties break on
        the smaller pair for determinism."""
        if vocab_size < 256:
            raise ValueError("vocab_size must be >= 256 (byte-level)")
        data = corpus.encode("utf-8") if isinstance(corpus, str) else bytes(corpus)
        ids = np.frombuffer(data, np.uint8).astype(np.int64)
        merges = []
        next_id = 256
        while next_id < vocab_size and len(ids) >= 2:
            pairs = ids[:-1] << 32 | ids[1:]
            uniq, counts = np.unique(pairs, return_counts=True)
            # skip overlapping self-pairs' overcount only matters for ties;
            # standard BPE ignores it
            best_i = np.lexsort((uniq, -counts))[0]
            if counts[best_i] < 2:
                break
            key = int(uniq[best_i])
            left, right = key >> 32, key & 0xFFFFFFFF
            merges.append((left, right, next_id))
            # apply: replace every non-overlapping (left, right) occurrence
            hit = (ids[:-1] == left) & (ids[1:] == right)
            # clear overlapping hits left-to-right (e.g. 'aaa' with pair aa)
            idx = np.flatnonzero(hit)
            if len(idx) > 1:
                keep = [idx[0]]
                for j in idx[1:]:
                    if j > keep[-1] + 1:
                        keep.append(j)
                idx = np.asarray(keep)
            out = ids.copy()
            out[idx] = next_id
            mask = np.ones(len(ids), bool)
            mask[idx + 1] = False
            ids = out[mask]
            next_id += 1
        return cls(merges)

    # -- apply ---------------------------------------------------------------

    @property
    def vocab_size(self) -> int:
        return len(self._bytes)

    def token_bytes(self, tok: int) -> bytes:
        return self._bytes[tok]

    def encode(self, text) -> np.ndarray:
        """str (utf-8) or bytes -> int32 token ids."""
        data = text.encode("utf-8") if isinstance(text, str) else bytes(text)
        if not data:
            return np.zeros((0,), np.int32)
        if self._handle is not None:
            lib = _lib()
            buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
            out = np.empty(len(data), np.int32)
            n = lib.kf_bpe_encode(
                self._handle, buf, len(data),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return out[:n].copy()
        return self._encode_py(data)

    def decode(self, ids, errors: str = "replace") -> str:
        return self.decode_bytes(ids).decode("utf-8", errors=errors)

    def decode_bytes(self, ids) -> bytes:
        ids = np.asarray(ids, np.int32)
        if ids.size == 0:
            return b""
        if self._handle is not None:
            lib = _lib()
            idp = ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            need = lib.kf_bpe_decode(self._handle, idp, ids.size, None, 0)
            if need < 0:
                raise ValueError("token id out of range")
            out = (ctypes.c_uint8 * need)()
            lib.kf_bpe_decode(self._handle, idp, ids.size, out, need)
            return bytes(out)
        return b"".join(self._bytes[int(t)] for t in ids)

    def _encode_py(self, data: bytes) -> np.ndarray:
        ids = list(data)
        while len(ids) >= 2:
            best = None
            for i in range(len(ids) - 1):
                hit = self._ranks.get((ids[i], ids[i + 1]))
                if hit is not None and (best is None or hit[0] < best):
                    best = hit[0]
            if best is None:
                break
            nxt = []
            i = 0
            while i < len(ids):
                hit = self._ranks.get((ids[i], ids[i + 1])) if i + 1 < len(ids) else None
                if hit is not None and hit[0] == best:
                    nxt.append(hit[1])
                    i += 2
                else:
                    nxt.append(ids[i])
                    i += 1
            ids = nxt
        return np.asarray(ids, np.int32)

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"format": "kfunca-bpe-v1", "merges": self.merges}, f)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            d = json.load(f)
        if d.get("format") != "kfunca-bpe-v1":
            raise ValueError(f"not a kfunca bpe file: {path}")
        return cls(d["merges"])

    def __del__(self):
        if getattr(self, "_handle", None) is not None:
            lib = _lib()
            if lib is not None:
                lib.kf_bpe_destroy(self._handle)
