"""Speculative decoding: a draft model proposes, the target verifies.

Serving-latency extension (no reference analog; the reference ships no
serving at all).  One "round" commits up to gamma+1 tokens for ONE
target-model forward:

  1. the draft model autoregressively proposes d_1..d_gamma (gamma cheap
     decode steps on its own KV cache);
  2. the target runs ONE forward over [last_committed, d_1..d_gamma]
     (gamma+1 positions — an MXU-friendly matmul instead of gamma+1
     serial decode steps);
  3. greedy acceptance: keep the longest prefix where the draft token
     equals the target argmax, then commit the target's own token for the
     first mismatching position (Leviathan et al.'s greedy special case).
     The committed stream is BIT-IDENTICAL to target-only greedy decoding
     — speculation changes latency, never output (tested);
  4. both caches "roll back" for free: rejected positions hold stale K/V,
     but the next round's writes land at exactly those slots BEFORE
     attention reads them (dynamic_update_slice precedes the einsum in
     _block_with_cache), and the causal mask admits nothing beyond the
     query's own position.

TPU-first structure: the whole generation is ONE compiled program — a
lax.while_loop whose carry holds both caches, the output buffer, and the
commit cursor; every round's shapes are static (gamma proposals, gamma+1
verify positions, gamma+1-wide buffer writes whose junk tail is always
overwritten by the next round's write at the advanced cursor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .generate import forward_with_cache, init_kv_cache
from .transformer import TransformerConfig


@partial(jax.jit, static_argnames=("cfg_t", "cfg_d", "max_new", "gamma"))
def speculative_generate(
    params_t, cfg_t: TransformerConfig,
    params_d, cfg_d: TransformerConfig,
    prompt, max_new: int, gamma: int = 4,
):
    """Greedy speculative generation (B=1).

    prompt: (1, T) int32.  Returns ((1, max_new) tokens, rounds) where
    `rounds` is the number of target forwards spent — the speedup diagnostic
    (rounds == max_new means the draft never helped; rounds ~= max_new /
    (gamma+1) means it always did)."""
    b, t_prompt = prompt.shape
    assert b == 1, "speculative_generate: single-sequence (per-sequence acceptance)"
    margin = gamma + 1
    max_len = t_prompt + max_new + margin

    t_cache = init_kv_cache(cfg_t, b, max_len)
    d_cache = init_kv_cache(cfg_d, b, max_len)

    # prefill BOTH models on all but the last prompt token; the last prompt
    # token is `last` and enters each cache on its next forward
    logits_t, t_cache = forward_with_cache(
        params_t, prompt[:, :-1], t_cache, jnp.int32(0), cfg_t
    )
    _, d_cache = forward_with_cache(
        params_d, prompt[:, :-1], d_cache, jnp.int32(0), cfg_d
    )
    del logits_t

    out = jnp.zeros((max_new + margin,), jnp.int32)
    # carry: (t_cache, d_cache, pos, last, out, n_out, rounds)
    #   pos   = committed sequence length INCLUDING `last`
    #   last  = last committed token, not yet forwarded by either model
    init = (t_cache, d_cache, jnp.int32(t_prompt), prompt[0, -1].astype(jnp.int32),
            out, jnp.int32(0), jnp.int32(0))

    def cond(carry):
        return carry[5] < max_new

    def round_body(carry):
        t_cache, d_cache, pos, last, out, n_out, rounds = carry

        # 1. draft proposes gamma tokens (its cache catches up on `last`)
        def d_step(c, i):
            dc, tok = c
            lg, dc = forward_with_cache(
                params_d, tok[None, None], dc, (pos - 1 + i).astype(jnp.int32), cfg_d
            )
            nxt = jnp.argmax(lg[0, -1], axis=-1).astype(jnp.int32)
            return (dc, nxt), nxt

        (d_cache, _), drafts = jax.lax.scan(
            d_step, (d_cache, last), jnp.arange(gamma, dtype=jnp.int32)
        )  # drafts: (gamma,)

        # 2. target verifies all gamma+1 positions in one forward
        verify_in = jnp.concatenate([last[None], drafts])[None]  # (1, gamma+1)
        lg, t_cache = forward_with_cache(
            params_t, verify_in, t_cache, (pos - 1).astype(jnp.int32), cfg_t
        )
        targets = jnp.argmax(lg[0], axis=-1).astype(jnp.int32)  # (gamma+1,)

        # 3. longest matching prefix; commit n accepted drafts + 1 corrected
        match = drafts == targets[:gamma]
        n_acc = jnp.argmin(jnp.append(match, False)).astype(jnp.int32)  # first False
        corrected = targets[n_acc]
        commit = jnp.where(
            jnp.arange(gamma + 1, dtype=jnp.int32) == n_acc,
            corrected,
            jnp.append(drafts, jnp.int32(0)),
        )  # (gamma+1,): d_1..d_n, corrected, junk (overwritten next round)
        out = jax.lax.dynamic_update_slice(out, commit, (n_out,))
        return (t_cache, d_cache, pos + n_acc + 1, corrected, out,
                n_out + n_acc + 1, rounds + 1)

    _, _, _, _, out, _, rounds = jax.lax.while_loop(cond, round_body, init)
    return out[:max_new][None], rounds
