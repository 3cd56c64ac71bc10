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


@partial(jax.jit, static_argnames=("cfg_t", "cfg_d", "max_new", "gamma", "temperature"))
def speculative_generate_sampled(
    params_t, cfg_t: TransformerConfig,
    params_d, cfg_d: TransformerConfig,
    prompt, max_new: int, gamma: int = 4, temperature: float = 1.0, key=None,
):
    """Stochastic speculative sampling (B=1), Leviathan et al.'s rule:
    accept draft token x with probability min(1, p(x)/q(x)); on the first
    rejection resample from norm(max(p - q, 0)).  The OUTPUT DISTRIBUTION
    equals target-only sampling at `temperature` exactly — speculation is
    a latency transform, not an approximation.

    Returns ((1, max_new) tokens, rounds)."""
    b, t_prompt = prompt.shape
    assert b == 1, "speculative_generate_sampled: single-sequence"
    if key is None:
        key = jax.random.PRNGKey(0)
    margin = gamma + 1
    max_len = t_prompt + max_new + margin
    inv_t = jnp.float32(1.0 / max(temperature, 1e-6))

    t_cache = init_kv_cache(cfg_t, b, max_len)
    d_cache = init_kv_cache(cfg_d, b, max_len)
    _, t_cache = forward_with_cache(params_t, prompt[:, :-1], t_cache, jnp.int32(0), cfg_t)
    _, d_cache = forward_with_cache(params_d, prompt[:, :-1], d_cache, jnp.int32(0), cfg_d)

    out = jnp.zeros((max_new + margin,), jnp.int32)
    init = (t_cache, d_cache, jnp.int32(t_prompt), prompt[0, -1].astype(jnp.int32),
            out, jnp.int32(0), jnp.int32(0), key)

    def cond(carry):
        return carry[5] < max_new

    def round_body(carry):
        t_cache, d_cache, pos, last, out, n_out, rounds, key = carry

        # 1. draft proposes gamma tokens AND remembers its sampling probs
        def d_step(c, i):
            dc, tok, k = c
            lg, dc = forward_with_cache(
                params_d, tok[None, None], dc, (pos - 1 + i).astype(jnp.int32), cfg_d
            )
            q = jax.nn.softmax(lg[0, -1].astype(jnp.float32) * inv_t)
            k, sub = jax.random.split(k)
            nxt = jax.random.categorical(sub, jnp.log(q + 1e-30)).astype(jnp.int32)
            return (dc, nxt, k), (nxt, q)

        (d_cache, _, key), (drafts, qs) = jax.lax.scan(
            d_step, (d_cache, last, key), jnp.arange(gamma, dtype=jnp.int32)
        )  # drafts (gamma,), qs (gamma, V)

        # 2. one target forward over [last, d_1..d_gamma]
        verify_in = jnp.concatenate([last[None], drafts])[None]
        lg, t_cache = forward_with_cache(
            params_t, verify_in, t_cache, (pos - 1).astype(jnp.int32), cfg_t
        )
        ps = jax.nn.softmax(lg[0].astype(jnp.float32) * inv_t, axis=-1)  # (gamma+1, V)

        # 3. accept-reject: u_i < p(d_i)/q(d_i)
        key, k_acc, k_res, k_bonus = jax.random.split(key, 4)
        u = jax.random.uniform(k_acc, (gamma,))
        p_d = jnp.take_along_axis(ps[:gamma], drafts[:, None], axis=1)[:, 0]
        q_d = jnp.take_along_axis(qs, drafts[:, None], axis=1)[:, 0]
        accept = u < jnp.minimum(1.0, p_d / jnp.maximum(q_d, 1e-30))
        n_acc = jnp.argmin(jnp.append(accept, False)).astype(jnp.int32)

        # 4a. rejected at n_acc: resample from norm(max(p - q, 0)); the
        #     all-accepted case appends a bonus token from p_{gamma+1}
        resid = jnp.maximum(ps[jnp.minimum(n_acc, gamma - 1)]
                            - qs[jnp.minimum(n_acc, gamma - 1)], 0.0)
        resid = resid / jnp.maximum(jnp.sum(resid), 1e-30)
        resampled = jax.random.categorical(k_res, jnp.log(resid + 1e-30)).astype(jnp.int32)
        bonus = jax.random.categorical(
            k_bonus, jnp.log(ps[gamma] + 1e-30)
        ).astype(jnp.int32)
        corrected = jnp.where(n_acc == gamma, bonus, resampled)

        commit = jnp.where(
            jnp.arange(gamma + 1, dtype=jnp.int32) == n_acc,
            corrected,
            jnp.append(drafts, jnp.int32(0)),
        )
        out = jax.lax.dynamic_update_slice(out, commit, (n_out,))
        return (t_cache, d_cache, pos + n_acc + 1, corrected, out,
                n_out + n_acc + 1, rounds + 1, key)

    _, _, _, _, out, _, rounds, _ = jax.lax.while_loop(cond, round_body, init)
    return out[:max_new][None], rounds
