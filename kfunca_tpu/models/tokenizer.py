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
    """merges: ordered list of (left, right, result) with result >= 256.

    `special_tokens`: ordered list of literal strings (e.g. "<|eos|>",
    "<|im_start|>") assigned ids AFTER the BPE vocab, in order.  Specials
    never merge with surrounding text: encode() splits the input on the
    literals (longest-first) and BPE-encodes only the segments between
    them; decode() renders their literal strings back.  This is the
    tiktoken/HF "added tokens" convention — the ids are stable, the
    literals round-trip, and SFT/chat markup survives tokenization."""

    def __init__(self, merges, special_tokens=()):
        self.merges = [(int(l), int(r), int(t)) for l, r, t in merges]
        self._ranks = {(l, r): (rank, t) for rank, (l, r, t) in enumerate(self.merges)}
        # id -> bytes, built incrementally from the merges
        self._bytes = [bytes([i]) for i in range(256)]
        for l, r, t in self.merges:
            if t != len(self._bytes):
                raise ValueError(f"merge result ids must be dense from 256; got {t}")
            self._bytes.append(self._bytes[l] + self._bytes[r])
        self.special_tokens = list(special_tokens)
        if len(set(self.special_tokens)) != len(self.special_tokens):
            raise ValueError("duplicate special tokens")
        self._special_id = {s: len(self._bytes) + i
                            for i, s in enumerate(self.special_tokens)}
        # longest-first: overlapping literals resolve to the longest match
        self._special_order = sorted(self.special_tokens, key=len,
                                     reverse=True)
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
        # (specials are added post-training via with_special_tokens)
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
        return len(self._bytes) + len(self.special_tokens)

    def special_id(self, literal: str) -> int:
        """Token id of a registered special literal (KeyError if absent)."""
        return self._special_id[literal]

    def token_bytes(self, tok: int) -> bytes:
        if tok >= len(self._bytes):
            return self.special_tokens[tok - len(self._bytes)].encode("utf-8")
        return self._bytes[tok]

    def encode(self, text, allow_special: bool = True) -> np.ndarray:
        """str (utf-8) or bytes -> int32 token ids.  With allow_special
        (default) occurrences of registered special literals become their
        single ids (longest match first) and never merge across their
        boundaries; allow_special=False treats them as plain text."""
        if (allow_special and self.special_tokens
                and isinstance(text, str)):
            parts = self._split_special(text)
            if len(parts) > 1 or (parts and isinstance(parts[0], int)):
                out = []
                for p in parts:
                    if isinstance(p, int):
                        out.append(np.asarray([p], np.int32))
                    else:
                        out.append(self.encode(p, allow_special=False))
                return (np.concatenate(out) if out
                        else np.zeros((0,), np.int32))
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

    def _split_special(self, text: str):
        """[str | special_id] pieces, literals matched longest-first."""
        parts = [text]
        for lit in self._special_order:
            nxt = []
            for p in parts:
                if isinstance(p, int) or lit not in p:
                    nxt.append(p)
                    continue
                segs = p.split(lit)
                for i, seg in enumerate(segs):
                    if i:
                        nxt.append(self._special_id[lit])
                    if seg:
                        nxt.append(seg)
            parts = nxt
        return parts

    def decode(self, ids, errors: str = "replace") -> str:
        return self.decode_bytes(ids).decode("utf-8", errors=errors)

    def decode_bytes(self, ids) -> bytes:
        ids = np.asarray(ids, np.int32)
        if ids.size == 0:
            return b""
        if self.special_tokens and bool((ids >= len(self._bytes)).any()):
            # split runs at special ids: BPE-decode the runs natively,
            # splice the literals
            out, run = [], []
            for t_ in ids.tolist():
                if t_ >= len(self._bytes):
                    if run:
                        out.append(self.decode_bytes(np.asarray(run, np.int32)))
                        run = []
                    out.append(self.token_bytes(t_))
                else:
                    run.append(t_)
            if run:
                out.append(self.decode_bytes(np.asarray(run, np.int32)))
            return b"".join(out)
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
            json.dump({"format": "kfunca-bpe-v1", "merges": self.merges,
                       "special_tokens": self.special_tokens}, f)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            d = json.load(f)
        if d.get("format") != "kfunca-bpe-v1":
            raise ValueError(f"not a kfunca bpe file: {path}")
        return cls(d["merges"], d.get("special_tokens", ()))

    def with_special_tokens(self, special_tokens) -> "BPETokenizer":
        """A new tokenizer sharing the merges with `special_tokens`
        appended after the BPE vocab (the post-training registration
        step — ids of existing text tokens are unchanged)."""
        return BPETokenizer(self.merges, special_tokens)

    def __del__(self):
        if getattr(self, "_handle", None) is not None:
            lib = _lib()
            if lib is not None:
                lib.kf_bpe_destroy(self._handle)
