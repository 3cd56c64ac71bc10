"""Continuous-batching inference for Mamba: constant-memory slot states.

The SSM serving advantage made concrete: where the attention engine
(models/serve.py) needs paged KV pools, page tables, and a page
allocator, a Mamba slot is a CONSTANT-size recurrent state — (d_inner,
d_state) fp32 + a (k-1, d_inner) conv tail per layer — regardless of how
long the sequence runs.  No paging, no eviction, no prefix cache
invalidation; admission is just writing a freshly prefillled state into a
slot row.

Construction mirrors serve.py's compiled-program discipline:
  * ONE jitted decode step serves all slots: (B,) tokens -> (B,) next
    tokens + updated stacked states; inactive slots decode garbage
    harmlessly (their rows are overwritten at admission).
  * prefill is ONE compiled program per LENGTH BUCKET: prompts pad right
    to a power-of-two bucket and the scan carries a valid-counter so
    padding steps pass the state through untouched — the resulting state
    is exactly the unpadded prompt's state (pinned in
    tests/test_mamba_serve.py).
  * per-request temperature rides as a traced (B,) vector: one compiled
    step serves a mixed greedy/sampled batch (0 = argmax).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .mamba import MambaConfig, _token_step


def _stack_states(cfg: MambaConfig, batch: int):
    """Stacked per-layer states: lists of {ssm (B,di,N), conv (B,k-1,di)}."""
    return [
        {
            "ssm": jnp.zeros((batch, cfg.d_inner, cfg.d_state), jnp.float32),
            "conv": jnp.zeros((batch, cfg.d_conv - 1, cfg.d_inner),
                              cfg.act_dtype),
        }
        for _ in range(cfg.n_layers)
    ]


class MambaServer:
    """Continuous-batching greedy/sampled decoding over slot states."""

    def __init__(self, params, cfg: MambaConfig, batch_slots: int = 4,
                 eos_token: int | None = None, seed: int = 0):
        self.params = params
        self.cfg = cfg
        self.B = batch_slots
        self.eos = eos_token
        self.key = jax.random.PRNGKey(seed)
        self.states = _stack_states(cfg, batch_slots)
        self.tokens = jnp.zeros((batch_slots,), jnp.int32)
        self._queue: list[dict] = []
        self._slots: list[dict | None] = [None] * batch_slots
        self._results: dict[int, list[int]] = {}
        self._next_id = 0
        self._prefill_cache: dict[int, callable] = {}
        self._decode = jax.jit(self._decode_step)

    # -- compiled programs --------------------------------------------------

    def _decode_step(self, params, tokens, states, temps, key):
        logits, states = _token_step(params, tokens, states, self.cfg)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        sampled = jax.random.categorical(
            key, logits / jnp.maximum(temps, 1e-6)[:, None], axis=-1
        ).astype(jnp.int32)
        nxt = jnp.where(temps > 0.0, sampled, greedy)
        return nxt, states

    def _prefill_fn(self, bucket: int):
        """Compiled once per pow2 bucket: (prompt (1, bucket), n_valid) ->
        (last-token logits argmax seed token, per-layer slot states)."""
        cfg = self.cfg

        def run(params, prompt, n_valid):
            states = _stack_states(cfg, 1)

            def step(carry, xs):
                states, last_logits = carry
                tok, i = xs
                logits, new_states = _token_step(params, tok[None], states,
                                                 cfg)
                live = i < n_valid
                states = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(live, n, o), new_states, states)
                last_logits = jnp.where(live, logits[0], last_logits)
                return (states, last_logits), None

            init = (states, jnp.zeros((cfg.vocab_size,), jnp.float32))
            (states, last_logits), _ = jax.lax.scan(
                step, init, (prompt[0], jnp.arange(prompt.shape[1])))
            return last_logits, states

        return jax.jit(run)

    # -- public API ----------------------------------------------------------

    def submit(self, prompt, max_new: int = 16,
               temperature: float = 0.0) -> int:
        rid = self._next_id
        self._next_id += 1
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
            bucket = 1 << max(0, (n - 1)).bit_length()
            if bucket not in self._prefill_cache:
                self._prefill_cache[bucket] = self._prefill_fn(bucket)
            padded = np.zeros((1, bucket), np.int32)
            padded[0, :n] = req["prompt"]
            logits, state = self._prefill_cache[bucket](
                self.params, jnp.asarray(padded), jnp.int32(n))
            first = int(jnp.argmax(logits))
            if req["temp"] > 0.0:
                self.key, k = jax.random.split(self.key)
                first = int(jax.random.categorical(
                    k, logits / max(req["temp"], 1e-6)))
            self.tokens = self.tokens.at[slot].set(first)
            for layer, st in zip(self.states, state):
                layer["ssm"] = layer["ssm"].at[slot].set(st["ssm"][0])
                layer["conv"] = layer["conv"].at[slot].set(st["conv"][0])
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
            self.tokens, self.states = self._decode(
                self.params, self.tokens, self.states, temps, k)
            toks = np.asarray(self.tokens)
            for slot, req in enumerate(self._slots):
                if req is None:
                    continue
                req["out"].append(int(toks[slot]))
                self._finish_if_done(slot)
        return self._results
