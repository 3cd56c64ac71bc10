"""Memory-efficient chunked-vocab cross-entropy.

The standard LM loss path (models/transformer.py loss_fn) materializes the
full fp32 logits tensor (B, S, V) twice over — once in the forward pass and
once as the saved residual log-softmax needs for its backward.  At vocab
32k-128k that tensor dwarfs every activation in the model (B8 x S2048 x
V32k fp32 = 2 GiB), and on a TPU it is pure HBM traffic: the MXU produces
it tile by tile only for the VPU to immediately reduce it back down to one
scalar per token.

This module streams the LM head instead (the Liger-kernel / chunked-CE
recipe, rebuilt TPU-first on `lax.scan` + a custom VJP rather than a
hand-rolled kernel — XLA already fuses the per-chunk matmul + online
logsumexp update into one HBM pass over the chunk):

  forward:  scan over vocab chunks of the head weight; per chunk compute
            logits (N, C) in fp32, fold them into a running online
            logsumexp (m, s) and gather the target column when it falls in
            the chunk.  Peak extra memory is O(N*C), independent of V.
  backward: recompute each chunk's logits from the saved (x, lse),
            d_logits = (softmax - onehot) * g, accumulate dx and emit the
            chunk's dW.  Same O(N*C) bound; costs one extra head matmul
            (the classic recompute-vs-save trade, same as flash attention).

No reference analog (the reference ships no loss/model layer); the design
contract it extends is the flash-attention one: never materialize a tensor
whose only purpose is to be reduced (reference
src/device/utils/causal_attention.h:113-185 streams KV for the same
reason).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _chunk_weights(w, chunk: int):
    """(D, V) head -> ((nc, D, C) stacked chunks, chunk base indices)."""
    d, v = w.shape
    nc = -(-v // chunk)
    pad = nc * chunk - v
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
    wc = w.reshape(d, nc, chunk).transpose(1, 0, 2)
    bases = jnp.arange(nc, dtype=jnp.int32) * jnp.int32(chunk)
    return wc, bases


def _chunk_logits(x, wi, base, v, chunk: int):
    """One chunk's fp32 logits with padded columns masked to -inf.

    Matmul runs in the activation dtype with fp32 accumulation — the exact
    contract of the unchunked head (transformer.py forward)."""
    logits = jnp.dot(x, wi.astype(x.dtype), preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + base
    return jnp.where(col < jnp.int32(v), logits, -jnp.inf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def chunked_softmax_xent(x, w, targets, chunk: int = 4096):
    """Per-token negative log-likelihood without materializing full logits.

    x: (N, D) activations (any float dtype; matmul accumulates fp32)
    w: (D, V) LM head weight (fp32 params; cast per chunk like the
       unchunked path)
    targets: (N,) int32/int64 class ids in [0, V)
    chunk: vocab tile width; peak transient memory is N*chunk fp32.

    Returns nll (N,) fp32 == -log_softmax(x @ w)[targets].
    """
    nll, _ = _xent_fwd(x, w, targets, chunk)
    return nll


def _xent_fwd(x, w, targets, chunk: int):
    n, _ = x.shape
    v = w.shape[1]
    wc, bases = _chunk_weights(w, chunk)
    targets = targets.astype(jnp.int32)

    def body(carry, inp):
        m, s, tl = carry
        wi, base = inp
        logits = _chunk_logits(x, wi, base, v, chunk)
        mc = jnp.max(logits, axis=-1)
        mn = jnp.maximum(m, mc)
        # m == -inf on the first step: exp(-inf - mn) == 0, no special case
        s = s * jnp.exp(m - mn) + jnp.sum(jnp.exp(logits - mn[:, None]), axis=-1)
        loc = targets - base
        hit = (loc >= 0) & (loc < chunk)
        val = jnp.take_along_axis(
            logits, jnp.clip(loc, 0, chunk - 1)[:, None], axis=-1
        )[:, 0]
        tl = tl + jnp.where(hit, val, jnp.float32(0.0))
        return (mn, s, tl), None

    init = (
        jnp.full((n,), -jnp.inf, jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    (m, s, tl), _ = jax.lax.scan(body, init, (wc, bases))
    lse = m + jnp.log(s)
    return lse - tl, (x, w, targets, lse)


def _xent_bwd(chunk: int, res, g):
    x, w, targets, lse = res
    n, d = x.shape
    v = w.shape[1]
    wc, bases = _chunk_weights(w, chunk)
    targets = targets.astype(jnp.int32)
    gf = g.astype(jnp.float32)

    def body(dx, inp):
        wi, base = inp
        logits = _chunk_logits(x, wi, base, v, chunk)
        p = jnp.exp(logits - lse[:, None])  # padded cols: exp(-inf) == 0
        loc = targets - base
        hit = (loc >= 0) & (loc < chunk)
        onehot = (
            loc[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        ) & hit[:, None]
        dl = (p - onehot.astype(jnp.float32)) * gf[:, None]
        # dx in fp32 (accumulator); dW per chunk in fp32 (param dtype)
        dx = dx + jnp.dot(
            dl.astype(x.dtype), wi.astype(x.dtype).T,
            preferred_element_type=jnp.float32,
        )
        dwi = jnp.dot(
            x.T, dl.astype(x.dtype), preferred_element_type=jnp.float32
        )
        return dx, dwi

    dx0 = jnp.zeros((n, d), jnp.float32)
    dx, dwc = jax.lax.scan(body, dx0, (wc, bases))
    dw = dwc.transpose(1, 0, 2).reshape(d, -1)[:, :v]
    return dx.astype(x.dtype), dw.astype(w.dtype), None


chunked_softmax_xent.defvjp(_xent_fwd, _xent_bwd)
