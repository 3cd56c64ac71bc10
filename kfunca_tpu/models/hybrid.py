"""Hybrid attention + selective-SSM LM (the Jamba architecture class).

Interleaves the two sequence mixers the zoo already ships — causal flash
attention (models/transformer.attention_mixer) and the Mamba selective
SSM (models/mamba.mamba_mixer) — in one residual stack: most layers are
SSM (O(1) decode state, linear-time training), a sparse subset are
attention (exact content-based retrieval the SSM state can't do).  Every
layer is mixer -> residual -> SwiGLU MLP -> residual (the Jamba block;
pure Mamba has no MLP, pure transformers are all-attention — the hybrid
keeps the MLP uniformly so the attention:SSM ratio is the only knob).

Why this wins for serving: with attention every `attn_every` layers the
KV cache shrinks by that factor while the SSM layers carry constant
(B, d_inner, d_state) state — at Jamba's 1:7 ratio the decode memory is
~an order of magnitude below an equal-size transformer, and decode stays
one fused step program (no cache gather for 7/8 of the layers).

Both mixers are REUSED, not reimplemented: the attention layers get the
same fused Pallas flash kernel / GQA / RoPE path as the flagship, the SSM
layers the same chunked-or-Pallas selective scan as the Mamba family —
one kernel library, three architectures (SURVEY.md §7's design stance).

No reference analog (/root/reference ships no models); green-field like
the rest of the zoo.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .mamba import (
    MambaConfig,
    _mixer_step,
    init_mamba_mixer,
    mamba_mixer,
)
from .transformer import (
    TransformerConfig,
    _init_linear,
    _masked_mean,
    attention_mixer,
    mlp,
    rms_norm,
)

IGNORE = -100


@dataclass(frozen=True)
class HybridConfig:
    vocab_size: int = 512
    d_model: int = 256
    n_layers: int = 8
    d_ff: int = 704
    # attention sub-config (applies to the attention layers)
    n_heads: int = 4
    n_kv_heads: int | None = None
    max_seq_len: int = 1024
    rope_theta: float = 10000.0
    attention_window: int | None = None
    # SSM sub-config (applies to the mamba layers)
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None
    scan_chunk: int | None = 128
    # placement: layer i is attention iff i % attn_every == attn_offset
    # (Jamba: one attention layer per period of 8, mid-period).  An
    # explicit `pattern` of "attn"/"mamba" strings overrides both.
    attn_every: int = 4
    attn_offset: int = 2
    pattern: tuple[str, ...] | None = None
    norm_eps: float = 1e-5
    dtype: str = "bfloat16"

    def layer_kinds(self) -> tuple[str, ...]:
        if self.pattern is not None:
            assert len(self.pattern) == self.n_layers, (
                self.pattern, self.n_layers)
            assert all(k in ("attn", "mamba") for k in self.pattern)
            return tuple(self.pattern)
        return tuple(
            "attn" if i % self.attn_every == self.attn_offset else "mamba"
            for i in range(self.n_layers)
        )

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def tcfg(self) -> TransformerConfig:
        """Sub-config driving the reused attention mixer."""
        return TransformerConfig(
            vocab_size=self.vocab_size, d_model=self.d_model,
            n_heads=self.n_heads, n_kv_heads=self.n_kv_heads,
            n_layers=self.n_layers, d_ff=self.d_ff,
            max_seq_len=self.max_seq_len, rope_theta=self.rope_theta,
            attention_window=self.attention_window,
            norm_eps=self.norm_eps, dtype=self.dtype)

    @property
    def mcfg(self) -> MambaConfig:
        """Sub-config driving the reused SSM mixer."""
        return MambaConfig(
            vocab_size=self.vocab_size, d_model=self.d_model,
            n_layers=self.n_layers, d_state=self.d_state,
            d_conv=self.d_conv, expand=self.expand, dt_rank=self.dt_rank,
            scan_chunk=self.scan_chunk, norm_eps=self.norm_eps,
            dtype=self.dtype)


def init_hybrid_params(key, cfg: HybridConfig):
    keys = jax.random.split(key, cfg.n_layers + 1)
    tc = cfg.tcfg
    params = {
        "embed": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.d_model), jnp.float32) * 0.02,
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "blocks": [],
    }
    for i, kind in enumerate(cfg.layer_kinds()):
        k = jax.random.split(keys[1 + i], 5)
        blk = {
            "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "mlp_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "w_gate": _init_linear(k[0], cfg.d_model, cfg.d_ff),
            "w_up": _init_linear(k[1], cfg.d_model, cfg.d_ff),
            "w_down": _init_linear(k[2], cfg.d_ff, cfg.d_model),
        }
        if kind == "attn":
            blk["wqkv"] = _init_linear(k[3], cfg.d_model, tc.qkv_out)
            blk["wo"] = _init_linear(k[4], cfg.d_model, cfg.d_model)
        else:
            blk.update(init_mamba_mixer(k[3], cfg.mcfg))
        params["blocks"].append(blk)
    return params


def _hybrid_block(x, p, kind: str, cfg: HybridConfig):
    y = rms_norm(x, p["attn_norm"], cfg.norm_eps)
    if kind == "attn":
        o = attention_mixer(y, p, cfg.tcfg)
    else:
        o = mamba_mixer(y, p, cfg.mcfg)
    x = x + o.astype(x.dtype)
    y = rms_norm(x, p["mlp_norm"], cfg.norm_eps)
    return x + mlp(y, p, cfg.tcfg).astype(x.dtype)


def hidden_states(params, tokens, cfg: HybridConfig):
    x = params["embed"][tokens].astype(cfg.act_dtype)
    for p, kind in zip(params["blocks"], cfg.layer_kinds()):
        x = _hybrid_block(x, p, kind, cfg)
    return rms_norm(x, params["final_norm"], cfg.norm_eps)


def forward(params, tokens, cfg: HybridConfig):
    """tokens (B, S) int32 -> fp32 logits (B, S, vocab); tied head."""
    x = hidden_states(params, tokens, cfg)
    return jnp.dot(x, params["embed"].T.astype(x.dtype),
                   preferred_element_type=jnp.float32)


def loss_fn(params, tokens, targets, cfg: HybridConfig,
            ignore_index: int | None = IGNORE):
    logits = forward(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = targets if ignore_index is None else jnp.maximum(targets, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, targets, ignore_index)


def make_hybrid_train_step(cfg: HybridConfig, oc=None):
    from .train import OptConfig, apply_update

    oc = oc or OptConfig(lr=1e-3)

    def step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets,
                                                  cfg)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# decode: heterogeneous per-layer state (KV cache | recurrent SSM state)
# ---------------------------------------------------------------------------


def init_hybrid_state(cfg: HybridConfig, batch: int, max_len: int):
    """Attention layers carry a bounded KV cache; SSM layers the constant
    (B, d_inner, d_state) recurrent state + (k-1)-deep conv tail."""
    tc, mc = cfg.tcfg, cfg.mcfg
    states = []
    for kind in cfg.layer_kinds():
        if kind == "attn":
            shape = (batch, tc.kv_heads, max_len, tc.head_dim)
            states.append({"k": jnp.zeros(shape, cfg.act_dtype),
                           "v": jnp.zeros(shape, cfg.act_dtype)})
        else:
            states.append({
                "ssm": jnp.zeros((batch, mc.d_inner, mc.d_state),
                                 jnp.float32),
                "conv": jnp.zeros((batch, mc.d_conv - 1, mc.d_inner),
                                  cfg.act_dtype),
            })
    return states


def _hybrid_token_step(params, tok, states, pos, cfg: HybridConfig):
    """One token (B,) through the whole stack at absolute position pos ->
    (logits (B, V), new states)."""
    from .generate import cached_attention_mixer

    x = params["embed"][tok].astype(cfg.act_dtype)
    new_states = []
    for p, st, kind in zip(params["blocks"], states, cfg.layer_kinds()):
        y = rms_norm(x, p["attn_norm"], cfg.norm_eps)
        if kind == "attn":
            o, st = cached_attention_mixer(y[:, None], p, st,
                                           pos.astype(jnp.int32), cfg.tcfg)
            o = o[:, 0]
        else:
            o, st = _mixer_step(y, p, st, cfg.mcfg)
        x = x + o.astype(x.dtype)
        y = rms_norm(x, p["mlp_norm"], cfg.norm_eps)
        x = x + mlp(y, p, cfg.tcfg).astype(x.dtype)
        new_states.append(st)
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = jnp.dot(x, params["embed"].T.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return logits, new_states


def generate(params, prompt, cfg: HybridConfig, max_new_tokens: int = 32,
             eos_id: int = -1):
    """Greedy generation as ONE compiled program: the prompt streams
    through the recurrent step (the SSM layers force token-order anyway;
    the attention layers fill their KV cache along the way), then new
    tokens scan.  prompt (B, S) int32 -> (B, max_new_tokens) int32;
    post-EOS slots 0."""
    b, s = prompt.shape
    max_len = s + max_new_tokens

    @jax.jit
    def run(params, prompt):
        states = init_hybrid_state(cfg, b, max_len)

        def prefill(carry, inp):
            states = carry
            tok, pos = inp
            logits, states = _hybrid_token_step(params, tok, states, pos,
                                                cfg)
            return states, logits

        states, logits = jax.lax.scan(
            prefill, states, (prompt.T, jnp.arange(s, dtype=jnp.int32)))
        tok0 = jnp.argmax(logits[-1], axis=-1).astype(jnp.int32)

        def step(carry, pos):
            tok, states, done = carry
            logits, states = _hybrid_token_step(params, tok, states, pos,
                                                cfg)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, jnp.int32(0), nxt)
            out = jnp.where(done, jnp.int32(0), tok)
            done = done | (tok == eos_id)
            return (nxt, states, done), out

        (_, _, _), toks = jax.lax.scan(
            step, (tok0, states, jnp.zeros((b,), bool)),
            jnp.arange(s, s + max_new_tokens, dtype=jnp.int32))
        return toks.T

    return run(params, prompt)
