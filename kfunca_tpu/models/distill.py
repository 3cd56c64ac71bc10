"""Knowledge distillation: chunked-vocab forward-KL against a teacher.

Completes the training stack's transfer-learning corner (pretrain ->
SFT/LoRA -> DPO/GRPO -> distill).  No reference analog (the reference
`/root/reference` ships no loss/model layer); the design contract extended
here is the chunked-vocab one from models/loss.py: never materialize a
(B, S, V) tensor whose only purpose is to be reduced.

The token-level objective is the classic Hinton KD loss

    L = alpha * tau^2 * KL(p_T^tau || p_S^tau) + (1 - alpha) * CE(hard)

with p^tau = softmax(z / tau).  The KL term needs BOTH the teacher's and
the student's full-vocab distributions per token — materialized naively
that is two (B*S, V) fp32 tensors.  Here both heads are streamed together
over vocab chunks with one online accumulator pass:

    KL_i = lse_S - lse_T + sum_v p_T(v) * (z_T(v) - z_S(v))

where the weighted-difference sum is tracked in the teacher's running-max
domain exactly like an online logsumexp (the same m/s carry the flash
kernels and chunked_softmax_xent use; when the max moves, the partial sum
rescales by exp(m_old - m_new)).  Peak transient memory is O(N * chunk)
for each head — independent of V.

The backward recomputes each chunk's logits from the saved (x, lse) pairs
and emits d z_S = (p_S - p_T) * g / tau per chunk (the textbook softmax-KL
gradient), accumulating dx_S and the student head's dW chunk by chunk —
one extra head matmul, the same recompute-vs-save trade as the forward
loss.  Teacher inputs get zero cotangents (they sit under stop_gradient in
every caller anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .loss import _chunk_weights, chunked_softmax_xent
from .train import OptConfig, apply_update
from .transformer import _masked_mean, hidden_states, lm_head_weight


def _chunk_logits_masked(x, wi, base, v, chunk: int, inv_tau):
    """One chunk's fp32 temperature-scaled logits + validity mask.

    Unlike loss._chunk_logits this returns the mask instead of writing
    -inf into padded columns: the KL accumulator multiplies logit
    DIFFERENCES by teacher probabilities, and (-inf) - (-inf) is NaN — the
    mask lets the caller zero padded terms before they poison the sum."""
    logits = jnp.dot(x, wi.astype(x.dtype),
                     preferred_element_type=jnp.float32) * inv_tau
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + base
    valid = col < jnp.int32(v)
    return jnp.where(valid, logits, -jnp.inf), valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def chunked_kd_kl(x_s, w_s, x_t, w_t, chunk: int = 4096, tau: float = 1.0):
    """Per-token KL(teacher^tau || student^tau) without full logits.

    x_s: (N, D_s) student activations; w_s: (D_s, V) student head
    x_t: (N, D_t) teacher activations; w_t: (D_t, V) teacher head
    (student and teacher may have different widths; the vocab must match)
    chunk: vocab tile width; peak transient memory is 2 * N * chunk fp32
    tau: softmax temperature (logits are divided by tau; the Hinton tau^2
         loss scaling is the caller's job, see distill_loss)

    Returns kl (N,) fp32 >= 0.  Differentiable w.r.t. x_s and w_s;
    teacher args receive zero cotangents.
    """
    kl, _ = _kd_fwd(x_s, w_s, x_t, w_t, chunk, tau)
    return kl


def _kd_fwd(x_s, w_s, x_t, w_t, chunk: int, tau: float):
    n = x_s.shape[0]
    v = w_s.shape[1]
    assert w_t.shape[1] == v, (w_s.shape, w_t.shape)
    wcs, bases = _chunk_weights(w_s, chunk)
    wct, _ = _chunk_weights(w_t, chunk)
    inv_tau = jnp.float32(1.0 / tau)

    def body(carry, inp):
        m_s, s_s, m_t, s_t, u = carry
        wi_s, wi_t, base = inp
        z_s, _ = _chunk_logits_masked(x_s, wi_s, base, v, chunk, inv_tau)
        z_t, valid = _chunk_logits_masked(x_t, wi_t, base, v, chunk, inv_tau)
        # student online lse
        mn_s = jnp.maximum(m_s, jnp.max(z_s, axis=-1))
        s_s = s_s * jnp.exp(m_s - mn_s) + jnp.sum(
            jnp.exp(z_s - mn_s[:, None]), axis=-1)
        # teacher online lse + weighted logit-difference sum in the same
        # running-max domain (rescales with s_t when the max moves)
        mn_t = jnp.maximum(m_t, jnp.max(z_t, axis=-1))
        scale = jnp.exp(m_t - mn_t)
        e_t = jnp.exp(z_t - mn_t[:, None])
        diff = jnp.where(valid, z_t - z_s, jnp.float32(0.0))
        s_t = s_t * scale + jnp.sum(e_t, axis=-1)
        u = u * scale + jnp.sum(e_t * diff, axis=-1)
        return (mn_s, s_s, mn_t, s_t, u), None

    neg = jnp.full((n,), -jnp.inf, jnp.float32)
    zero = jnp.zeros((n,), jnp.float32)
    (m_s, s_s, m_t, s_t, u), _ = jax.lax.scan(
        body, (neg, zero, neg, zero, zero), (wcs, wct, bases))
    lse_s = m_s + jnp.log(s_s)
    lse_t = m_t + jnp.log(s_t)
    kl = lse_s - lse_t + u / s_t
    return kl, (x_s, w_s, x_t, w_t, lse_s, lse_t)


def _kd_bwd(chunk: int, tau: float, res, g):
    x_s, w_s, x_t, w_t, lse_s, lse_t = res
    n, d_s = x_s.shape
    v = w_s.shape[1]
    wcs, bases = _chunk_weights(w_s, chunk)
    wct, _ = _chunk_weights(w_t, chunk)
    inv_tau = jnp.float32(1.0 / tau)
    # d KL / d z_s = p_s - p_t; z_s = (x_s @ w_s) / tau
    gf = g.astype(jnp.float32) * inv_tau

    def body(dx, inp):
        wi_s, wi_t, base = inp
        z_s, _ = _chunk_logits_masked(x_s, wi_s, base, v, chunk, inv_tau)
        z_t, _ = _chunk_logits_masked(x_t, wi_t, base, v, chunk, inv_tau)
        p_s = jnp.exp(z_s - lse_s[:, None])  # padded cols: exp(-inf) == 0
        p_t = jnp.exp(z_t - lse_t[:, None])
        dl = (p_s - p_t) * gf[:, None]
        dx = dx + jnp.dot(dl.astype(x_s.dtype), wi_s.astype(x_s.dtype).T,
                          preferred_element_type=jnp.float32)
        dwi = jnp.dot(x_s.T, dl.astype(x_s.dtype),
                      preferred_element_type=jnp.float32)
        return dx, dwi

    dx0 = jnp.zeros((n, d_s), jnp.float32)
    dx, dwc = jax.lax.scan(body, dx0, (wcs, wct, bases))
    dw = dwc.transpose(1, 0, 2).reshape(d_s, -1)[:, :v]
    return (dx.astype(x_s.dtype), dw.astype(w_s.dtype),
            jnp.zeros_like(x_t), jnp.zeros_like(w_t))


chunked_kd_kl.defvjp(_kd_fwd, _kd_bwd)


def distill_loss(student_params, teacher_params, tokens, targets,
                 s_cfg, t_cfg, alpha: float = 0.5, tau: float = 1.0,
                 ignore_index: int = -100, vocab_chunk: int = 4096):
    """Mean KD objective over unmasked positions + metrics.

    Student and teacher run their own trunks (any width/depth; vocab must
    match).  The teacher forward sits under stop_gradient so autodiff
    allocates no cotangents for it.  Returns (loss, metrics) with
    metrics = {"kd": mean tau^2-scaled KL, "ce": mean hard-target NLL}.
    """
    x_s = hidden_states(student_params, tokens, s_cfg)
    x_t = jax.lax.stop_gradient(hidden_states(teacher_params, tokens, t_cfg))
    b, s, d_s = x_s.shape
    w_s = lm_head_weight(student_params, jnp.float32)
    w_t = jax.lax.stop_gradient(lm_head_weight(teacher_params, jnp.float32))
    flat_s = x_s.reshape(b * s, d_s)
    flat_t = x_t.reshape(b * s, x_t.shape[-1])
    flat_tgt = targets.reshape(-1)

    kl = chunked_kd_kl(flat_s, w_s, flat_t, w_t, vocab_chunk, tau)
    kd = _masked_mean(kl, flat_tgt, ignore_index) * jnp.float32(tau * tau)
    # ignored targets (< 0) never hit any chunk: gathered logit 0, finite
    # nll, masked out by _masked_mean
    nll = chunked_softmax_xent(flat_s, w_s, jnp.maximum(flat_tgt, 0),
                               vocab_chunk)
    ce = _masked_mean(nll, flat_tgt, ignore_index)
    loss = jnp.float32(alpha) * kd + jnp.float32(1.0 - alpha) * ce
    return loss, {"kd": jax.lax.stop_gradient(kd),
                  "ce": jax.lax.stop_gradient(ce)}


def make_distill_step(teacher_params, t_cfg, s_cfg,
                      oc: OptConfig = OptConfig(),
                      alpha: float = 0.5, tau: float = 1.0,
                      ignore_index: int = -100, vocab_chunk: int = 4096):
    """Distillation train step: step(params, opt_state, tokens, targets)
    -> (params, opt_state, metrics) with metrics["loss"] the combined
    objective.  teacher_params are closed over frozen."""
    def step(params, opt_state, tokens, targets):
        def loss_fn(p):
            return distill_loss(p, teacher_params, tokens, targets,
                                s_cfg, t_cfg, alpha, tau,
                                ignore_index, vocab_chunk)
        (loss_v, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, {"loss": loss_v, **metrics}

    return step
