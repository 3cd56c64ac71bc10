"""Continuous-batching inference for MLA models: compressed-latent slots.

The MLA serving advantage made concrete: where the attention engine
(models/serve.py) pools per-head K/V pages, an MLA slot caches ONE
(kv_lora_rank + qk_rope_head_dim) latent vector per position per layer —
at DeepSeek geometry a ~order-of-magnitude HBM cut per token — and
decode runs in the absorbed form (scores dot the latent history
directly; values re-expand only after the probability-weighted sum, so
full K/V never exist).  Slots are dense (B, max_len, d_c + rope) rows
rather than paged: the latent row is already so small that paging
overhead would exceed what it saves at serving batch sizes.

Construction mirrors MambaServer's compiled-program discipline
(models/mamba_serve.py):
  * ONE jitted decode step serves all slots at PER-SLOT absolute
    positions (mla.mla_attend_cached_perslot): (B,) tokens -> (B,) next
    tokens + updated latent caches; inactive slots decode garbage
    harmlessly (their rows are overwritten at admission).
  * prefill is ONE compiled program per pow2 LENGTH BUCKET over the
    batch-1 cached forward (generate.forward_with_cache); the padded
    tail beyond the prompt writes garbage latents that decode never
    reads (the per-slot causal mask stops at the slot's position).
  * per-request temperature rides as a traced (B,) vector: one compiled
    step serves a mixed greedy/sampled batch (0 = argmax).

Greedy parity with generate() is pinned in tests/test_mla_serve.py.
No reference analog (the reference is a single-chip op library).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .generate import forward_with_cache, init_kv_cache
from .mla import mla_attend_cached_perslot
from .transformer import TransformerConfig, apply_norm, lm_head_weight, mlp


def _mla_token_step(params, tokens, caches, positions,
                    cfg: TransformerConfig):
    """(B,) tokens at (B,) per-slot positions -> (logits (B, V) fp32,
    new latent caches)."""
    from .transformer import embed_tokens

    x = embed_tokens(params, tokens[:, None], cfg)  # (B, 1, d)
    new_caches = []
    for p, lc in zip(params["blocks"], caches):
        y = apply_norm(x, p, "attn_norm", cfg)
        o, nlc = mla_attend_cached_perslot(y, p, lc, positions, cfg)
        x = x + o.astype(x.dtype)
        y = apply_norm(x, p, "mlp_norm", cfg)
        x = x + mlp(y, p, cfg).astype(x.dtype)
        new_caches.append(nlc)
    x = apply_norm(x, params, "final_norm", cfg)
    logits = jnp.dot(x[:, 0], lm_head_weight(params, x.dtype),
                     preferred_element_type=jnp.float32)
    return logits, new_caches


class MLAServer:
    """Continuous-batching greedy/sampled decoding over latent slots."""

    def __init__(self, params, cfg: TransformerConfig, batch_slots: int = 4,
                 max_seq_len: int = 256, eos_token: int | None = None,
                 seed: int = 0):
        assert cfg.attention == "mla", "MLAServer serves MLA configs"
        self.params = params
        self.cfg = cfg
        self.B = batch_slots
        self.max_len = max_seq_len
        self.eos = eos_token
        self.key = jax.random.PRNGKey(seed)
        # init_kv_cache dispatches to the MLA latent cache for mla configs
        self.caches = init_kv_cache(cfg, batch_slots, max_seq_len)
        self.tokens = jnp.zeros((batch_slots,), jnp.int32)
        self.positions = jnp.zeros((batch_slots,), jnp.int32)
        self._queue: list[dict] = []
        self._slots: list[dict | None] = [None] * batch_slots
        self._results: dict[int, list[int]] = {}
        self._next_id = 0
        self._prefill_cache: dict[int, callable] = {}
        self._decode = jax.jit(self._decode_step)

    # -- compiled programs --------------------------------------------------

    def _decode_step(self, params, tokens, caches, positions, temps, key):
        logits, caches = _mla_token_step(params, tokens, caches, positions,
                                         self.cfg)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        sampled = jax.random.categorical(
            key, logits / jnp.maximum(temps, 1e-6)[:, None], axis=-1
        ).astype(jnp.int32)
        nxt = jnp.where(temps > 0.0, sampled, greedy)
        return nxt, caches

    def _prefill_fn(self, bucket: int):
        """Compiled per pow2 bucket: (prompt (1, bucket), n_valid) ->
        (last-valid-token logits, per-layer batch-1 latent cache)."""
        cfg = self.cfg
        max_len = self.max_len

        def run(params, prompt, n_valid):
            cache = init_kv_cache(cfg, 1, max_len)
            logits, cache = forward_with_cache(
                params, prompt, cache, jnp.int32(0), cfg)
            last = logits[0, n_valid - 1]  # last VALID prompt position
            return last, cache

        return jax.jit(run)

    # -- public API ----------------------------------------------------------

    def submit(self, prompt, max_new: int = 16,
               temperature: float = 0.0) -> int:
        rid = self._next_id
        self._next_id += 1
        need = len(prompt) + int(max_new)
        if need > self.max_len:
            raise ValueError(
                f"request needs {need} positions > max_seq_len "
                f"{self.max_len}")
        self._queue.append({
            "id": rid, "prompt": [int(t) for t in prompt],
            "max_new": int(max_new), "temp": float(temperature),
        })
        return rid

    def _admit(self):
        for slot in range(self.B):
            if self._slots[slot] is not None or not self._queue:
                continue
            req = self._queue.pop(0)
            n = len(req["prompt"])
            # Clamp the pow2 bucket to the cache length: with a non-pow2
            # max_seq_len (say 100) a 70-token prompt passes the submit()
            # guard but would bucket to 128, and mla_attend_cached's
            # dynamic_update_slice of a (1,128,·) update into a (1,100,·)
            # cache is a trace-time crash.
            bucket = min(1 << max(0, (n - 1)).bit_length(), self.max_len)
            if bucket not in self._prefill_cache:
                self._prefill_cache[bucket] = self._prefill_fn(bucket)
            padded = np.zeros((1, bucket), np.int32)
            padded[0, :n] = req["prompt"]
            logits, cache = self._prefill_cache[bucket](
                self.params, jnp.asarray(padded), jnp.int32(n))
            first = int(jnp.argmax(logits))
            if req["temp"] > 0.0:
                self.key, k = jax.random.split(self.key)
                first = int(jax.random.categorical(
                    k, logits / max(req["temp"], 1e-6)))
            self.tokens = self.tokens.at[slot].set(first)
            self.positions = self.positions.at[slot].set(n)
            for layer, lc in zip(self.caches, cache):
                layer["ckv"] = layer["ckv"].at[slot].set(lc["ckv"][0])
                layer["kpe"] = layer["kpe"].at[slot].set(lc["kpe"][0])
            req["out"] = [first]
            self._slots[slot] = req
            self._finish_if_done(slot)

    def _finish_if_done(self, slot):
        req = self._slots[slot]
        if req is None:
            return
        done = len(req["out"]) >= req["max_new"] or (
            self.eos is not None and req["out"][-1] == self.eos)
        if done:
            self._results[req["id"]] = req["out"]
            self._slots[slot] = None

    def run(self, max_steps: int = 10_000) -> dict[int, list[int]]:
        """Drain the queue; returns {request id: generated tokens}."""
        for _ in range(max_steps):
            self._admit()
            if all(s is None for s in self._slots):
                if not self._queue:
                    break
                continue
            temps = jnp.asarray(
                [s["temp"] if s else 0.0 for s in self._slots], jnp.float32)
            self.key, k = jax.random.split(self.key)
            self.tokens, self.caches = self._decode(
                self.params, self.tokens, self.caches, self.positions,
                temps, k)
            self.positions = self.positions + 1
            toks = np.asarray(self.tokens)
            for slot, req in enumerate(self._slots):
                if req is None:
                    continue
                req["out"].append(int(toks[slot]))
                self._finish_if_done(slot)
        return self._results
