"""Mamba-2 (SSD) family: matmul-native state-space training, O(1) decode.

Where Mamba-1's selective scan is elementwise (VPU work — see the Pallas
kernel in ops/pallas_kernels/ssm_scan.py), Mamba-2's STATE-SPACE DUALITY
(Dao & Gu 2024) restructures the same semiseparable operator into chunked
MATMULS: per chunk an attention-like (C B^T ∘ decay) score matrix applied
to values, plus a cheap inter-chunk recurrence over chunk-boundary states.
That makes the architecture MXU-native by construction on TPU — the
FLOPs-dominant ops are (chunk x chunk) and (chunk x state x head_dim)
contractions XLA maps straight onto the systolic array, no custom kernel
needed.  This module implements exactly that chunked SSD in jnp einsums.

Mamba-2 specifics vs Mamba-1 (all matched to HF Mamba2ForCausalLM, the
parity oracle in tests/test_mamba2.py): multi-head structure with a
SCALAR A (and dt) per head, grouped B/C shared across heads (the GQA
analog), one fused in_proj emitting [gate, x|B|C (conv'd together), dt],
a GATED RMSNorm before out_proj (y * silu(gate), then RMS), and the D
skip on the undiscretized x.

Decode is the O(1) recurrent step: per layer a (H, head_dim, N) SSM state
plus the (k-1)-deep conv tail over the fused x|B|C channels.

Precision: params fp32, activations cfg.dtype, SSD math fp32.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .transformer import _init_linear, _masked_mean, rms_norm

IGNORE = -100


@dataclass(frozen=True)
class Mamba2Config:
    vocab_size: int = 512
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 8
    head_dim: int = 64
    d_state: int = 64  # HF state_size (Mamba-2 default 128; tests smaller)
    n_groups: int = 1  # B/C groups (heads share within a group)
    d_conv: int = 4
    expand: int = 2
    chunk_size: int = 64  # SSD chunk length (the matmul tile)
    norm_eps: float = 1e-5
    dtype: str = "bfloat16"

    @property
    def d_inner(self) -> int:
        di = self.expand * self.d_model
        assert di == self.n_heads * self.head_dim, (di, self.n_heads,
                                                    self.head_dim)
        return di

    @property
    def conv_dim(self) -> int:
        return self.d_inner + 2 * self.n_groups * self.d_state

    @property
    def proj_out(self) -> int:
        return 2 * self.d_inner + 2 * self.n_groups * self.d_state \
            + self.n_heads

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)


def init_mamba2_params(key, cfg: Mamba2Config):
    keys = jax.random.split(key, cfg.n_layers + 1)
    params = {
        "embed": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.d_model), jnp.float32) * 0.02,
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        k = jax.random.split(keys[1 + i], 4)
        u = jax.random.uniform(k[2], (cfg.n_heads,), jnp.float32)
        dt0 = jnp.exp(u * (math.log(0.1) - math.log(1e-3)) + math.log(1e-3))
        params["layers"].append({
            "norm": jnp.ones((cfg.d_model,), jnp.float32),
            "in_proj": _init_linear(k[0], cfg.d_model, cfg.proj_out),
            "conv_w": jax.random.normal(
                k[1], (cfg.d_conv, cfg.conv_dim), jnp.float32)
            * (1 / math.sqrt(cfg.d_conv)),
            "conv_b": jnp.zeros((cfg.conv_dim,), jnp.float32),
            "dt_bias": dt0 + jnp.log(-jnp.expm1(-dt0)),
            "A_log": jnp.log(jnp.arange(1, cfg.n_heads + 1,
                                        dtype=jnp.float32)),
            "D": jnp.ones((cfg.n_heads,), jnp.float32),
            "mixer_norm": jnp.ones((cfg.d_inner,), jnp.float32),
            "out_proj": _init_linear(k[3], cfg.d_inner, cfg.d_model),
        })
    return params


def _mm(y, w):
    return jnp.dot(y, w.astype(y.dtype), preferred_element_type=jnp.float32)


def _gated_rms(y, gate, w, eps):
    """HF MambaRMSNormGated: y * silu(gate) first, THEN RMS-normalized."""
    yf = y.astype(jnp.float32) * jax.nn.silu(gate.astype(jnp.float32))
    inv = jax.lax.rsqrt(jnp.mean(yf * yf, axis=-1, keepdims=True) + eps)
    return yf * inv * w


def _segsum_decay(a):
    """a (..., c) per-step log-decays -> L (..., c, c) with
    L[i, j] = exp(sum_{k=j+1..i} a_k) for i >= j else 0 (the SSD
    'attention mask')."""
    cs = jnp.cumsum(a, axis=-1)
    s = cs[..., :, None] - cs[..., None, :]
    c = a.shape[-1]
    tri = jnp.tril(jnp.ones((c, c), bool))
    return jnp.where(tri, jnp.exp(s), 0.0)


def ssd(x, dt_a, bm, c, chunk: int):
    """The chunked state-space duality operator.

    x (B, L, H, P) fp32 values ALREADY discretized (x * dt), dt_a
    (B, L, H) fp32 per-step log-decay (A * dt), bm/c (B, L, H, N) fp32
    (groups pre-expanded).  L % chunk == 0.  Returns y (B, L, H, P).

    Intra-chunk: Y_diag = (C B^T ∘ decay-mask) x — pure matmuls.
    Inter-chunk: boundary states ride a tiny lax.scan (L/chunk steps of
    (B, H, N, P) elementwise), then Y_off = decay * C . h_start."""
    b, L, h, p = x.shape
    n = bm.shape[-1]
    nc = L // chunk

    def ck(t):  # (B, L, ...) -> (B, nc, chunk, ...)
        return t.reshape((b, nc, chunk) + t.shape[2:])

    xc, ac, bc, cc = ck(x), ck(dt_a), ck(bm), ck(c)
    a_cum = jnp.cumsum(ac, axis=2)  # (B, nc, cs, H)

    # intra-chunk (the attention-like matmul block)
    decay = _segsum_decay(ac.transpose(0, 1, 3, 2))  # (B, nc, H, cs, cs)
    scores = jnp.einsum("bzihn,bzjhn->bzhij", cc, bc)
    y_diag = jnp.einsum("bzhij,bzjhp->bzihp", scores * decay, xc)

    # per-chunk input states (B terms decayed to the chunk end)
    decay_states = jnp.exp(a_cum[:, :, -1:, :] - a_cum)  # (B, nc, cs, H)
    states = jnp.einsum("bzjhn,bzjh,bzjhp->bzhnp", bc, decay_states, xc)

    # inter-chunk recurrence over the nc chunk boundaries
    a_tot = a_cum[:, :, -1, :]  # (B, nc, H)

    def step(hst, inputs):
        st, at = inputs  # (B, H, N, P), (B, H)
        hst = jnp.exp(at)[..., None, None] * hst + st
        return hst, hst

    h0 = jnp.zeros((b, h, n, p), jnp.float32)
    _, h_end = jax.lax.scan(
        step, h0, (states.swapaxes(0, 1), a_tot.swapaxes(0, 1)))
    # state ENTERING each chunk = previous chunk's end state
    h_start = jnp.concatenate([h0[None], h_end[:-1]], axis=0
                              ).swapaxes(0, 1)  # (B, nc, H, N, P)

    y_off = jnp.einsum("bzihn,bzhnp,bzih->bzihp", cc, h_start,
                       jnp.exp(a_cum))
    return (y_diag + y_off).reshape(b, L, h, p)


def _causal_conv(x, w, bias):
    k = w.shape[0]
    pad = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    L = x.shape[1]
    out = None
    for j in range(k):
        term = pad[:, j:j + L] * w[j].astype(x.dtype)
        out = term if out is None else out + term
    return out + bias.astype(x.dtype)


def _split_proj(proj, cfg: Mamba2Config):
    di, gn = cfg.d_inner, cfg.n_groups * cfg.d_state
    gate = proj[..., :di]
    xbc = proj[..., di:di + cfg.conv_dim]
    dt = proj[..., di + cfg.conv_dim:]
    return gate, xbc, dt


def _expand_groups(t, cfg: Mamba2Config):
    """(.., G, N) -> (.., H, N) by repeating each group H/G times."""
    reps = cfg.n_heads // cfg.n_groups
    return jnp.repeat(t, reps, axis=-2)


def mamba2_mixer(x, p, cfg: Mamba2Config):
    """One mixer over (B, L, d_model), SSD parallel form."""
    b, L, _ = x.shape
    h, hd, n = cfg.n_heads, cfg.head_dim, cfg.d_state
    proj = _mm(x, p["in_proj"]).astype(x.dtype)
    gate, xbc, dt = _split_proj(proj, cfg)
    xbc = jax.nn.silu(_causal_conv(xbc, p["conv_w"], p["conv_b"])
                      ).astype(x.dtype)
    xs = xbc[..., :cfg.d_inner].astype(jnp.float32)
    bm = xbc[..., cfg.d_inner:cfg.d_inner + cfg.n_groups * n
             ].astype(jnp.float32).reshape(b, L, cfg.n_groups, n)
    c = xbc[..., cfg.d_inner + cfg.n_groups * n:
            ].astype(jnp.float32).reshape(b, L, cfg.n_groups, n)
    bm, c = _expand_groups(bm, cfg), _expand_groups(c, cfg)

    dt = jax.nn.softplus(dt.astype(jnp.float32) + p["dt_bias"])  # (B, L, H)
    a = -jnp.exp(p["A_log"])  # (H,)
    xh = xs.reshape(b, L, h, hd)
    # D skip on the UNdiscretized x; SSD consumes x * dt
    y = ssd(xh * dt[..., None], dt * a, bm, c, _pick_chunk(L, cfg))
    y = y + xh * p["D"][:, None]
    y = y.reshape(b, L, cfg.d_inner)
    y = _gated_rms(y, gate, p["mixer_norm"], cfg.norm_eps)
    return _mm(y.astype(x.dtype), p["out_proj"])


def _pick_chunk(L, cfg: Mamba2Config):
    if L % cfg.chunk_size == 0:
        return cfg.chunk_size
    for c in (64, 32, 16, 8, 4, 2, 1):
        if L % c == 0:
            return c
    return 1


def forward(params, tokens, cfg: Mamba2Config):
    """tokens (B, L) int32 -> fp32 logits (B, L, vocab); tied head."""
    x = params["embed"][tokens].astype(cfg.act_dtype)
    for p in params["layers"]:
        y = rms_norm(x, p["norm"], cfg.norm_eps)
        x = x + mamba2_mixer(y, p, cfg).astype(x.dtype)
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    return jnp.dot(x, params["embed"].T.astype(x.dtype),
                   preferred_element_type=jnp.float32)


def loss_fn(params, tokens, targets, cfg: Mamba2Config,
            ignore_index: int | None = IGNORE):
    logits = forward(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = targets if ignore_index is None else jnp.maximum(targets, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, targets, ignore_index)


def make_mamba2_train_step(cfg: Mamba2Config, oc=None):
    from .train import OptConfig, apply_update

    oc = oc or OptConfig(lr=1e-3)

    def step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets,
                                                  cfg)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# recurrent decode (O(1) per token)
# ---------------------------------------------------------------------------


def init_mamba2_state(cfg: Mamba2Config, batch: int):
    return [
        {
            "ssm": jnp.zeros((batch, cfg.n_heads, cfg.head_dim,
                              cfg.d_state), jnp.float32),
            "conv": jnp.zeros((batch, cfg.d_conv - 1, cfg.conv_dim),
                              cfg.act_dtype),
        }
        for _ in range(cfg.n_layers)
    ]


def _mixer_step(x, p, state, cfg: Mamba2Config):
    """One token through one mixer: x (B, d_model) -> (out, new state)."""
    b = x.shape[0]
    h, hd, n = cfg.n_heads, cfg.head_dim, cfg.d_state
    proj = _mm(x, p["in_proj"]).astype(x.dtype)
    gate, xbc, dt = _split_proj(proj, cfg)
    window = jnp.concatenate([state["conv"], xbc[:, None]], axis=1)
    conv = jnp.einsum("bkc,kc->bc", window.astype(jnp.float32),
                      p["conv_w"]) + p["conv_b"]
    xbc = jax.nn.silu(conv)  # fp32 (B, conv_dim)
    xs = xbc[..., :cfg.d_inner].reshape(b, h, hd)
    bm = _expand_groups(
        xbc[..., cfg.d_inner:cfg.d_inner + cfg.n_groups * n
            ].reshape(b, cfg.n_groups, n), cfg)  # (B, H, N)
    c = _expand_groups(
        xbc[..., cfg.d_inner + cfg.n_groups * n:
            ].reshape(b, cfg.n_groups, n), cfg)

    dt = jax.nn.softplus(dt.astype(jnp.float32) + p["dt_bias"])  # (B, H)
    a = -jnp.exp(p["A_log"])
    dA = jnp.exp(dt * a)  # (B, H)
    ssm = (dA[..., None, None] * state["ssm"]
           + (dt[..., None] * xs)[..., None] * bm[:, :, None, :])
    y = jnp.einsum("bhpn,bhn->bhp", ssm, c) + xs * p["D"][:, None]
    y = y.reshape(b, cfg.d_inner)
    y = _gated_rms(y, gate, p["mixer_norm"], cfg.norm_eps)
    out = _mm(y.astype(x.dtype), p["out_proj"])
    return out, {"ssm": ssm, "conv": window[:, 1:]}


def _token_step(params, tok, states, cfg: Mamba2Config):
    x = params["embed"][tok].astype(cfg.act_dtype)
    new_states = []
    for p, st in zip(params["layers"], states):
        y = rms_norm(x, p["norm"], cfg.norm_eps)
        out, st = _mixer_step(y, p, st, cfg)
        x = x + out.astype(x.dtype)
        new_states.append(st)
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = jnp.dot(x, params["embed"].T.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return logits, new_states


def generate(params, prompt, cfg: Mamba2Config, max_new_tokens: int = 32,
             eos_id: int = -1):
    """Greedy generation as ONE compiled program (recurrent prefill +
    scanned decode); post-EOS slots hold 0."""
    b, s = prompt.shape

    @jax.jit
    def run(params, prompt):
        states = init_mamba2_state(cfg, b)

        def prefill(carry, tok):
            logits, states = _token_step(params, tok, carry, cfg)
            return states, logits

        states, logits = jax.lax.scan(prefill, states, prompt.T)
        tok0 = jnp.argmax(logits[-1], axis=-1).astype(jnp.int32)

        def step(carry, _):
            tok, states, done = carry
            logits, states = _token_step(params, tok, states, cfg)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, jnp.int32(0), nxt)
            out = jnp.where(done, jnp.int32(0), tok)
            done = done | (tok == eos_id)
            return (nxt, states, done), out

        (_, _, _), toks = jax.lax.scan(
            step, (tok0, states, jnp.zeros((b,), bool)), None,
            length=max_new_tokens)
        return toks.T

    return run(params, prompt)


# ---------------------------------------------------------------------------
# HuggingFace interop (Mamba2ForCausalLM)
# ---------------------------------------------------------------------------


def config_from_hf_mamba2(hf_config, dtype: str = "bfloat16"
                          ) -> Mamba2Config:
    g = (lambda k, d=None: hf_config.get(k, d)) if isinstance(
        hf_config, dict) else (lambda k, d=None: getattr(hf_config, k, d))
    return Mamba2Config(
        vocab_size=g("vocab_size"),
        d_model=g("hidden_size"),
        n_layers=g("num_hidden_layers"),
        n_heads=g("num_heads"),
        head_dim=g("head_dim"),
        d_state=g("state_size", 128),
        n_groups=g("n_groups", 1),
        d_conv=g("conv_kernel", 4),
        expand=g("expand", 2),
        chunk_size=g("chunk_size", 256),
        norm_eps=g("layer_norm_epsilon", 1e-5),
        dtype=dtype,
    )


def params_from_hf_mamba2(state_dict, cfg: Mamba2Config):
    from .hf import _np

    sd = state_dict
    params = {
        "embed": jnp.asarray(_np(sd["backbone.embeddings.weight"])),
        "final_norm": jnp.asarray(_np(sd["backbone.norm_f.weight"])),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        m = f"backbone.layers.{i}.mixer"
        params["layers"].append({
            "norm": jnp.asarray(_np(sd[f"backbone.layers.{i}.norm.weight"])),
            "in_proj": jnp.asarray(_np(sd[f"{m}.in_proj.weight"]).T),
            "conv_w": jnp.asarray(_np(sd[f"{m}.conv1d.weight"])[:, 0, :].T),
            "conv_b": jnp.asarray(_np(sd[f"{m}.conv1d.bias"])),
            "dt_bias": jnp.asarray(_np(sd[f"{m}.dt_bias"])),
            "A_log": jnp.asarray(_np(sd[f"{m}.A_log"])),
            "D": jnp.asarray(_np(sd[f"{m}.D"])),
            "mixer_norm": jnp.asarray(_np(sd[f"{m}.norm.weight"])),
            "out_proj": jnp.asarray(_np(sd[f"{m}.out_proj.weight"]).T),
        })
    return params


def from_hf_mamba2(model_or_path, dtype: str = "bfloat16"):
    if isinstance(model_or_path, (str, bytes)) or hasattr(
            model_or_path, "__fspath__"):
        from transformers import Mamba2ForCausalLM

        model = Mamba2ForCausalLM.from_pretrained(model_or_path)
    else:
        model = model_or_path
    cfg = config_from_hf_mamba2(model.config, dtype=dtype)
    return params_from_hf_mamba2(model.state_dict(), cfg), cfg
