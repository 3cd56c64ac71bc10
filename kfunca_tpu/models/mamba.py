"""Mamba-family selective state-space LM: parallel-scan training, O(1) decode.

The state-space architecture class (Gu & Dao 2023) rebuilt TPU-first.  The
CUDA ecosystem implements the selective scan as a hand-fused kernel
(mamba-ssm's selective_scan_fn) because GPUs lack a cheap parallel scan;
on TPU the parallel form is a log-depth scan over the first-order linear
recurrence

    h_t = dA_t * h_{t-1} + dBu_t,   (a2,b2) o (a1,b1) = (a1*a2, a2*b1 + b2)

Production path on real TPU: the PALLAS scan kernel
(ops/pallas_kernels/ssm_scan.py) — the whole recurrence lives in VMEM,
HBM sees only inputs/outputs; measured 8.1x on the end-to-end train step
vs the XLA associative-scan lowering (21.4 vs 174 ms/step at d512 L1024
B4 on v5e, grads matching to ~1e-7).  The XLA form (chunked for memory,
models/mamba.ssm_apply) remains the CPU/fallback engine and the parity
oracle.  Decode is the O(1)
recurrent step: a (B, d_inner, d_state) SSM state plus a (k-1)-deep conv
tail, scanned into one compiled program (no KV cache, constant memory in
sequence length — the architecture's serving advantage).

Block structure matches HF MambaForCausalLM (the parity oracle,
tests/test_mamba.py): RMSNorm -> mixer(in_proj -> causal depthwise conv ->
silu -> selective SSM (input-dependent dt/B/C, A = -exp(A_log), softplus
dt, Euler-discretized B) -> *silu(gate) -> out_proj), residual, tied head.

Precision: params fp32, activations cfg.dtype, the scan itself fp32 (the
recurrence compounds rounding multiplicatively — bf16 states drift).

Reference scope: /root/reference README declares transformer ops only;
this extends the model zoo past attention entirely.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..utils.errors import check
from .transformer import _init_linear, _masked_mean, rms_norm

IGNORE = -100


@dataclass(frozen=True)
class MambaConfig:
    vocab_size: int = 512
    d_model: int = 256
    n_layers: int = 4
    d_state: int = 16  # SSM state width per channel (HF state_size)
    d_conv: int = 4  # depthwise causal conv kernel (HF conv_kernel)
    expand: int = 2  # d_inner = expand * d_model
    dt_rank: int | None = None  # None = ceil(d_model / 16) (HF "auto")
    norm_eps: float = 1e-5
    dtype: str = "bfloat16"
    # chunked selective scan: sequences longer than this run as a
    # sequential scan over scan_chunk-step chunks (each chunk a log-depth
    # associative scan), bounding the (B, chunk, d_inner, N) state blowup
    # instead of materializing it for the full sequence.  None = always
    # the single full-sequence scan.  Applied when L % scan_chunk == 0.
    # 128 measured fastest on v5e (tools_mamba_scan_bench.py, interleaved
    # 3 rounds: d512 L1024 fwd+bwd 174 ms/step vs naive 186 / chunk256
    # 228 / chunk512 268; at d768 L2048 the naive scan does NOT fit 16G
    # HBM while chunk128 trains at 618 ms/step).
    scan_chunk: int | None = 128

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def rank(self) -> int:
        return self.dt_rank if self.dt_rank is not None else math.ceil(
            self.d_model / 16)

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)


def init_mamba_mixer(key, cfg: MambaConfig):
    """One mixer's params (no norm) — shared by the pure-Mamba stack and
    the heterogeneous attention+SSM stack (models/hybrid.py)."""
    k = jax.random.split(key, 6)
    di, ds, r = cfg.d_inner, cfg.d_state, cfg.rank
    # dt_proj bias init so softplus(bias) lands in [1e-3, 1e-1]
    # (the S4/Mamba dt init recipe)
    u = jax.random.uniform(k[4], (di,), jnp.float32)
    dt0 = jnp.exp(u * (math.log(0.1) - math.log(1e-3)) + math.log(1e-3))
    dt_bias = dt0 + jnp.log(-jnp.expm1(-dt0))  # inverse softplus
    return {
        "in_proj": _init_linear(k[0], cfg.d_model, 2 * di),
        "conv_w": jax.random.normal(k[1], (cfg.d_conv, di),
                                    jnp.float32) * (1 / math.sqrt(cfg.d_conv)),
        "conv_b": jnp.zeros((di,), jnp.float32),
        "x_proj": _init_linear(k[2], di, r + 2 * ds),
        "dt_proj": _init_linear(k[3], r, di),
        "dt_bias": dt_bias,
        # S4D-real initialization: A_n = n+1 per state column
        "A_log": jnp.log(jnp.broadcast_to(
            jnp.arange(1, ds + 1, dtype=jnp.float32), (di, ds))),
        "D": jnp.ones((di,), jnp.float32),
        "out_proj": _init_linear(k[5], di, cfg.d_model),
    }


def init_mamba_params(key, cfg: MambaConfig):
    keys = jax.random.split(key, cfg.n_layers + 1)
    params = {
        "embed": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.d_model), jnp.float32) * 0.02,
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        params["layers"].append({
            "norm": jnp.ones((cfg.d_model,), jnp.float32),
            **init_mamba_mixer(keys[1 + i], cfg),
        })
    return params


def _mm(y, w):
    return jnp.dot(y, w.astype(y.dtype), preferred_element_type=jnp.float32)


def _causal_conv(x, w, b):
    """Depthwise causal conv over the sequence axis: x (B, L, C),
    w (k, C), b (C).  Built from k shifted adds (k is 4-ish) — XLA fuses
    the stack into one elementwise pass; no conv op, no im2col."""
    k = w.shape[0]
    pad = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    L = x.shape[1]
    out = None
    for j in range(k):
        term = pad[:, j:j + L] * w[j].astype(x.dtype)
        out = term if out is None else out + term
    return out + b.astype(x.dtype)


def _ssm_inputs(hidden, p, cfg: MambaConfig):
    """Input-dependent SSM parameters from the conv output `hidden`
    (B, L, d_inner) -> (dt (B, L, di), Bm/C (B, L, N), A (di, N)), fp32.
    These are the SMALL tensors; the (B, L, di, N) dA/dBu blowup happens
    per-chunk inside ssm_apply."""
    r, ds = cfg.rank, cfg.d_state
    sp = _mm(hidden, p["x_proj"])  # fp32 (B, L, r + 2N)
    dt = jax.nn.softplus(
        jnp.dot(sp[..., :r], p["dt_proj"]) + p["dt_bias"])  # (B, L, di)
    Bm = sp[..., r:r + ds]  # (B, L, N)
    C = sp[..., r + ds:]  # (B, L, N)
    A = -jnp.exp(p["A_log"])  # (di, N)
    return dt, Bm, C, A


def _combine(left, right):
    """First-order linear recurrence h = a*h_prev + b is associative:
    (a2,b2) o (a1,b1) = (a1*a2, a2*b1 + b2)."""
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, a2 * b1 + b2


def selective_scan(dA, dBu):
    """h_t = dA_t * h_{t-1} + dBu_t over axis 1 (the sequence), h_0 = 0,
    via lax.associative_scan.  Materializes (B, L, di, N) — fine for
    short L; mamba_mixer routes long sequences through the chunked
    ssm_apply instead."""
    _, h = jax.lax.associative_scan(_combine, (dA, dBu), axis=1)
    return h


def ssm_apply(hidden, dt, Bm, C, A, D, chunk: int | None = None,
              engine: str = "xla"):
    """The selective-SSM readout y = C·h + D*u with h the scanned state,
    CHUNKED over the sequence: a sequential lax.scan over chunks of
    `chunk` steps carries the (B, di, N) boundary state, and each chunk
    runs the log-depth associative scan internally and contracts with C
    immediately.  Peak memory drops from O(B·L·di·N) (the naive parallel
    form) to O(B·chunk·di·N), while keeping ~all the VPU parallelism:
    the sequential depth is L/chunk instead of L.

    Measured on v5e (tools_mamba_scan_bench.py, interleaved, fwd+bwd
    train steps): chunk=128 is FASTER than the naive scan where both fit
    (d512 L1024 B4: 174 vs 186 ms/step) and is the only XLA form that
    fits at d768 L2048 B4 (naive asks 17.5G of 15.75G HBM; chunk128
    trains at 618 ms/step).  On real TPU, engine="pallas" (the
    _ssm_engine default) bypasses chunking entirely: the Pallas kernels
    measure 8.1x faster end-to-end (tools_ssm_isolate.py / /tmp ssm_e2e:
    21.4 vs 174 ms/step).  chunk=None (or >= L) falls back to the single
    full-sequence scan.  Exactness (values AND grads) vs the naive form
    is pinned in tests/test_mamba.py."""
    b, L, di = hidden.shape
    u = dt * hidden.astype(jnp.float32)  # (B, L, di)
    if engine == "pallas":
        # Pallas fwd+bwd kernels: the whole recurrence lives in VMEM, HBM
        # sees only inputs/outputs (ops/pallas_kernels/ssm_scan.py)
        from ..ops.pallas_kernels.ssm_scan import ssm_scan

        lb, dib = _pallas_ssm_blocks(L, di)
        y = ssm_scan(dt, u, Bm, C, jnp.transpose(A), lb, dib)
        return y + hidden.astype(jnp.float32) * D
    if chunk is None or chunk >= L:
        dA = jnp.exp(dt[..., None] * A[None, None])
        h = selective_scan(dA, u[..., None] * Bm[:, :, None, :])
        y = jnp.einsum("blin,bln->bli", h, C)
        return y + hidden.astype(jnp.float32) * D

    check(L % chunk == 0, "sequence length", L,
          "not divisible by scan chunk", chunk)
    n = L // chunk

    def to_chunks(x):  # (B, L, ...) -> (n, B, chunk, ...)
        return x.reshape((b, n, chunk) + x.shape[2:]).swapaxes(0, 1)

    # remat the chunk body: without it, reverse-mode through lax.scan
    # SAVES the (B, chunk, di, N) intermediates of every chunk — putting
    # the full O(B·L·di·N) blowup right back (measured: fwd+bwd at d768
    # L2048 B4 does not fit 16G HBM un-remat'ed at ANY chunk size).
    # Recomputing a chunk's scan from its small inputs costs one extra
    # forward pass of cheap VPU work.
    @jax.checkpoint
    def body(h0, xs):
        dt_c, u_c, B_c, C_c = xs  # (B, chunk, ...)
        dA = jnp.exp(dt_c[..., None] * A[None, None])  # (B, chunk, di, N)
        dBu = u_c[..., None] * B_c[:, :, None, :]
        a_cum, b_cum = jax.lax.associative_scan(_combine, (dA, dBu), axis=1)
        h = a_cum * h0[:, None] + b_cum  # fold in the carried boundary
        y = jnp.einsum("bcin,bcn->bci", h, C_c)
        return h[:, -1], y

    h0 = jnp.zeros((b, di, A.shape[-1]), jnp.float32)
    _, ys = jax.lax.scan(
        body, h0, (to_chunks(dt), to_chunks(u), to_chunks(Bm), to_chunks(C)))
    y = ys.swapaxes(0, 1).reshape(b, L, di)
    return y + hidden.astype(jnp.float32) * D


def _pallas_ssm_blocks(L, di):
    """(lb, dib) block sizes for the Pallas scan kernel, or (0, 0) when
    the shape can't tile (callers fall back to XLA)."""
    lb = 32 if L % 32 == 0 else (16 if L % 16 == 0 else 0)
    dib = 512 if di % 512 == 0 else (di if di in (128, 256, 384) else 0)
    return lb, dib


def _ssm_engine(cfg, L, di):
    """Dispatch-time engine choice (house rule: env read per call).
    Pallas on real TPU when the shape tiles; KFUNCA_SSM_ENGINE/
    KFUNCA_FORCE_XLA override."""
    import os

    from ..runtime.backend import backend

    eng = os.environ.get("KFUNCA_SSM_ENGINE")
    if eng:
        return eng
    if os.environ.get("KFUNCA_FORCE_XLA") == "1":
        return "xla"
    lb, dib = _pallas_ssm_blocks(L, di)
    if backend() == "tpu" and lb and dib and L > lb:
        return "pallas"
    return "xla"


def mamba_mixer(x, p, cfg: MambaConfig):
    """One mixer over (B, L, d_model) -> (B, L, d_model), parallel form."""
    proj = _mm(x, p["in_proj"]).astype(x.dtype)
    hidden, gate = jnp.split(proj, 2, axis=-1)
    hidden = jax.nn.silu(_causal_conv(hidden, p["conv_w"], p["conv_b"])
                         ).astype(x.dtype)
    dt, Bm, C, A = _ssm_inputs(hidden, p, cfg)
    L = x.shape[1]
    chunk = cfg.scan_chunk if (cfg.scan_chunk and L > cfg.scan_chunk
                               and L % cfg.scan_chunk == 0) else None
    y = ssm_apply(hidden, dt, Bm, C, A, p["D"], chunk,
                  engine=_ssm_engine(cfg, L, hidden.shape[-1]))
    y = y * jax.nn.silu(gate.astype(jnp.float32))
    return _mm(y.astype(x.dtype), p["out_proj"])


def forward(params, tokens, cfg: MambaConfig):
    """tokens (B, L) int32 -> fp32 logits (B, L, vocab); tied head."""
    x = params["embed"][tokens].astype(cfg.act_dtype)
    for p in params["layers"]:
        y = rms_norm(x, p["norm"], cfg.norm_eps)
        x = x + mamba_mixer(y, p, cfg).astype(x.dtype)
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    return jnp.dot(x, params["embed"].T.astype(x.dtype),
                   preferred_element_type=jnp.float32)


def loss_fn(params, tokens, targets, cfg: MambaConfig,
            ignore_index: int | None = IGNORE):
    logits = forward(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = targets if ignore_index is None else jnp.maximum(targets, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, targets, ignore_index)


def make_mamba_train_step(cfg: MambaConfig, oc=None):
    from .train import OptConfig, apply_update

    oc = oc or OptConfig(lr=1e-3)

    def step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets, cfg)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# recurrent decode (O(1) per token)
# ---------------------------------------------------------------------------


def init_mamba_state(cfg: MambaConfig, batch: int):
    """Per-layer recurrent state: the SSM hidden (B, d_inner, N) fp32 and
    the conv tail (B, k-1, d_inner) — constant memory in sequence length."""
    return [
        {
            "ssm": jnp.zeros((batch, cfg.d_inner, cfg.d_state), jnp.float32),
            "conv": jnp.zeros((batch, cfg.d_conv - 1, cfg.d_inner),
                              cfg.act_dtype),
        }
        for _ in range(cfg.n_layers)
    ]


def _mixer_step(x, p, state, cfg: MambaConfig):
    """One token through one mixer: x (B, d_model) -> (out, new state)."""
    proj = _mm(x, p["in_proj"]).astype(x.dtype)
    hidden, gate = jnp.split(proj, 2, axis=-1)  # (B, di)
    window = jnp.concatenate([state["conv"], hidden[:, None]], axis=1)
    conv = jnp.einsum("bkc,kc->bc", window.astype(jnp.float32),
                      p["conv_w"]) + p["conv_b"]
    hidden = jax.nn.silu(conv).astype(x.dtype)

    r, ds = cfg.rank, cfg.d_state
    sp = _mm(hidden, p["x_proj"])
    dt = jax.nn.softplus(jnp.dot(sp[..., :r], p["dt_proj"]) + p["dt_bias"])
    Bm, C = sp[..., r:r + ds], sp[..., r + ds:]
    A = -jnp.exp(p["A_log"])
    dA = jnp.exp(dt[..., None] * A[None])  # (B, di, N)
    dBu = (dt * hidden.astype(jnp.float32))[..., None] * Bm[:, None, :]
    ssm = dA * state["ssm"] + dBu
    y = jnp.einsum("bin,bn->bi", ssm, C)
    y = y + hidden.astype(jnp.float32) * p["D"]
    y = y * jax.nn.silu(gate.astype(jnp.float32))
    out = _mm(y.astype(x.dtype), p["out_proj"])
    return out, {"ssm": ssm, "conv": window[:, 1:]}


def _token_step(params, tok, states, cfg: MambaConfig):
    """One token (B,) through the whole stack -> (logits (B, V), states)."""
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


def generate(params, prompt, cfg: MambaConfig, max_new_tokens: int = 32,
             eos_id: int = -1):
    """Greedy generation as ONE compiled program: the prompt streams
    through the recurrent step (teacher-forced), then new tokens scan.
    prompt (B, S) int32 -> (B, max_new_tokens) int32; post-EOS slots 0."""
    b, s = prompt.shape

    @jax.jit
    def run(params, prompt):
        states = init_mamba_state(cfg, b)

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
# HuggingFace interop (MambaForCausalLM)
# ---------------------------------------------------------------------------


def config_from_hf_mamba(hf_config, dtype: str = "bfloat16") -> MambaConfig:
    g = (lambda k, d=None: hf_config.get(k, d)) if isinstance(
        hf_config, dict) else (lambda k, d=None: getattr(hf_config, k, d))
    rank = g("time_step_rank", "auto")
    return MambaConfig(
        vocab_size=g("vocab_size"),
        d_model=g("hidden_size"),
        n_layers=g("num_hidden_layers"),
        d_state=g("state_size", 16),
        d_conv=g("conv_kernel", 4),
        expand=g("expand", 2),
        dt_rank=None if rank == "auto" else int(rank),
        norm_eps=g("layer_norm_epsilon", 1e-5),
        dtype=dtype,
    )


def params_from_hf_mamba(state_dict, cfg: MambaConfig):
    """MambaForCausalLM state_dict -> our pytree (fp32).  HF Linears are
    (out, in) -> transposed; conv1d.weight (d_inner, 1, k) -> (k, d_inner).
    Assumes the default use_bias=False / use_conv_bias=True layout."""
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
            "x_proj": jnp.asarray(_np(sd[f"{m}.x_proj.weight"]).T),
            "dt_proj": jnp.asarray(_np(sd[f"{m}.dt_proj.weight"]).T),
            "dt_bias": jnp.asarray(_np(sd[f"{m}.dt_proj.bias"])),
            "A_log": jnp.asarray(_np(sd[f"{m}.A_log"])),
            "D": jnp.asarray(_np(sd[f"{m}.D"])),
            "out_proj": jnp.asarray(_np(sd[f"{m}.out_proj.weight"]).T),
        })
    return params


def from_hf_mamba(model_or_path, dtype: str = "bfloat16"):
    """(params, cfg) from a transformers Mamba model instance or path."""
    if isinstance(model_or_path, (str, bytes)) or hasattr(
            model_or_path, "__fspath__"):
        from transformers import MambaForCausalLM

        model = MambaForCausalLM.from_pretrained(model_or_path)
    else:
        model = model_or_path
    cfg = config_from_hf_mamba(model.config, dtype=dtype)
    return params_from_hf_mamba(model.state_dict(), cfg), cfg


def to_hf_mamba(params, cfg: MambaConfig) -> dict:
    """Our pytree -> a MambaForCausalLM state_dict (numpy fp32)."""
    import numpy as np

    sd = {
        "backbone.embeddings.weight": np.asarray(params["embed"], np.float32),
        "backbone.norm_f.weight": np.asarray(params["final_norm"], np.float32),
    }
    sd["lm_head.weight"] = sd["backbone.embeddings.weight"]
    for i, p in enumerate(params["layers"]):
        m = f"backbone.layers.{i}.mixer"
        sd[f"backbone.layers.{i}.norm.weight"] = np.asarray(
            p["norm"], np.float32)
        sd[f"{m}.in_proj.weight"] = np.asarray(p["in_proj"], np.float32).T
        sd[f"{m}.conv1d.weight"] = np.asarray(
            p["conv_w"], np.float32).T[:, None, :]
        sd[f"{m}.conv1d.bias"] = np.asarray(p["conv_b"], np.float32)
        sd[f"{m}.x_proj.weight"] = np.asarray(p["x_proj"], np.float32).T
        sd[f"{m}.dt_proj.weight"] = np.asarray(p["dt_proj"], np.float32).T
        sd[f"{m}.dt_proj.bias"] = np.asarray(p["dt_bias"], np.float32)
        sd[f"{m}.A_log"] = np.asarray(p["A_log"], np.float32)
        sd[f"{m}.D"] = np.asarray(p["D"], np.float32)
        sd[f"{m}.out_proj.weight"] = np.asarray(p["out_proj"], np.float32).T
    return sd


# ---------------------------------------------------------------------------
# mesh parallelism (dp x tp)
# ---------------------------------------------------------------------------


def mamba_param_specs(params) -> dict:
    """Channel-parallel TP over d_inner — the SSM analog of Megatron
    column/row pairs: in_proj/conv/dt_proj/A_log/D shard their d_inner
    axis over tp (the scan itself is elementwise in d_inner, so it runs
    fully sharded with zero collectives); x_proj and out_proj are the two
    row-parallel reduction points where GSPMD inserts the all-reduce.
    in_proj's 2*d_inner output splits [hidden|gate] at the midpoint,
    which stays shard-aligned because tp divides d_inner.  Forward parity
    pinned on the 8-device CPU mesh (tests/test_mamba.py::TestMesh).

    NOTE: under GSPMD tensor parallelism set KFUNCA_SSM_ENGINE=xla —
    pallas_call does not partition automatically; the XLA scan engine
    shards cleanly (the scan is elementwise in d_inner).  Single-chip
    training keeps the Pallas kernel's 8.1x."""
    from jax.sharding import PartitionSpec as P

    layers = [{
        "norm": P(),
        "in_proj": P(None, "tp"),
        "conv_w": P(None, "tp"),
        "conv_b": P("tp"),
        "x_proj": P("tp", None),  # row-parallel: dt/B/C all-reduce
        "dt_proj": P(None, "tp"),
        "dt_bias": P("tp"),
        "A_log": P("tp", None),
        "D": P("tp"),
        "out_proj": P("tp", None),  # row-parallel: block-output all-reduce
    } for _ in params["layers"]]
    return {"embed": P(None, "tp"), "final_norm": P(), "layers": layers}


def shard_mamba_params(params, mesh):
    from jax.sharding import NamedSharding

    specs = mamba_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)))
