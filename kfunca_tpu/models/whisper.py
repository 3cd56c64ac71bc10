"""Whisper-family speech-to-text: mel encoder-decoder, cached generation.

The audio modality of the "multimodal transformers" scope
(/root/reference/README.md:2): models/vision.py + dit.py cover images,
transformer.py/t5.py text — this is speech recognition (Radford et al.
2022): a conv-downsampled mel-spectrogram encoder and a causal text decoder
with cross-attention, matching HF WhisperForConditionalGeneration (the
parity oracle, tests/test_whisper.py).

Architecture quirks HF parity forces: pre-LayerNorm (with bias) blocks,
q/v/out projections biased but k_proj bias-FREE, q scaled by head_dim**-0.5
before the dot, exact (erf) GELU, sinusoidal encoder positions stored as a
(frozen) table + learned decoder positions, stride-2 conv frontend halving
the frame rate, tied proj_out.

TPU-first construction: the two short temporal convs lower to
lax.conv_general_dilated (XLA maps small-window convs onto the MXU via
implicit im2col — at kernel 3 this is the right primitive, unlike patchify
where non-overlapping blocks make reshape+matmul strictly better); the
rest is the same fp32-softmax SDPA + params-pytree discipline as the other
families.  Generation mirrors models/t5.py: encoder + per-layer
cross-attention K/V precompute once, then one lax.scan'd decode step over
a dynamic_update_slice self-attention cache — one compiled program.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .transformer import _init_linear, _masked_mean, layer_norm

IGNORE = -100


@dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 512
    n_mels: int = 80
    d_model: int = 256
    n_heads: int = 4
    n_enc_layers: int = 4
    n_dec_layers: int = 4
    d_ff: int = 1024
    max_source_positions: int = 1500  # frames AFTER the stride-2 conv
    max_target_positions: int = 448
    norm_eps: float = 1e-5
    dtype: str = "bfloat16"
    decoder_start_id: int = 0
    eos_id: int = 1

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)


def sinusoidal_positions(length: int, dim: int) -> jnp.ndarray:
    """Whisper's encoder position table (the HF init: interleaved
    sin/cos halves over log-spaced frequencies)."""
    log_timescale = math.log(10000.0) / (dim // 2 - 1)
    inv = jnp.exp(-log_timescale * jnp.arange(dim // 2, dtype=jnp.float32))
    ang = jnp.arange(length, dtype=jnp.float32)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)


def _init_attn(key, cfg: WhisperConfig):
    kq, kk, kv, ko = jax.random.split(key, 4)
    d = cfg.d_model
    return {
        "wq": _init_linear(kq, d, d), "bq": jnp.zeros((d,), jnp.float32),
        "wk": _init_linear(kk, d, d),  # k_proj carries no bias (HF quirk)
        "wv": _init_linear(kv, d, d), "bv": jnp.zeros((d,), jnp.float32),
        "wo": _init_linear(ko, d, d), "bo": jnp.zeros((d,), jnp.float32),
    }


def _init_lnorm(d):
    return jnp.ones((d,), jnp.float32), jnp.zeros((d,), jnp.float32)


def _init_mlp(key, cfg: WhisperConfig):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _init_linear(k1, cfg.d_model, cfg.d_ff),
        "fc1_b": jnp.zeros((cfg.d_ff,), jnp.float32),
        "fc2": _init_linear(k2, cfg.d_ff, cfg.d_model),
        "fc2_b": jnp.zeros((cfg.d_model,), jnp.float32),
    }


def init_whisper_params(key, cfg: WhisperConfig):
    keys = jax.random.split(key, 6)
    d = cfg.d_model
    params = {
        # conv frontend: (k, in, out) layout for lax.conv dimension numbers
        "conv1_w": jax.random.normal(
            keys[0], (3, cfg.n_mels, d), jnp.float32) / math.sqrt(3 * cfg.n_mels),
        "conv1_b": jnp.zeros((d,), jnp.float32),
        "conv2_w": jax.random.normal(
            keys[1], (3, d, d), jnp.float32) / math.sqrt(3 * d),
        "conv2_b": jnp.zeros((d,), jnp.float32),
        "enc_pos": sinusoidal_positions(cfg.max_source_positions, d),
        "embed": jax.random.normal(keys[2], (cfg.vocab_size, d),
                                   jnp.float32) * 0.02,
        "dec_pos": jax.random.normal(
            keys[3], (cfg.max_target_positions, d), jnp.float32) * 0.02,
        "encoder": [], "decoder": [],
    }
    params["enc_final_norm"], params["enc_final_norm_b"] = _init_lnorm(d)
    params["dec_final_norm"], params["dec_final_norm_b"] = _init_lnorm(d)
    for i in range(cfg.n_enc_layers):
        k = jax.random.fold_in(keys[4], i)
        ka, km = jax.random.split(k)
        blk = {"attn": _init_attn(ka, cfg), "mlp": _init_mlp(km, cfg)}
        blk["attn_norm"], blk["attn_norm_b"] = _init_lnorm(d)
        blk["mlp_norm"], blk["mlp_norm_b"] = _init_lnorm(d)
        params["encoder"].append(blk)
    for i in range(cfg.n_dec_layers):
        k = jax.random.fold_in(keys[5], i)
        ka, kc, km = jax.random.split(k, 3)
        blk = {"attn": _init_attn(ka, cfg), "cross": _init_attn(kc, cfg),
               "mlp": _init_mlp(km, cfg)}
        blk["attn_norm"], blk["attn_norm_b"] = _init_lnorm(d)
        blk["cross_norm"], blk["cross_norm_b"] = _init_lnorm(d)
        blk["mlp_norm"], blk["mlp_norm_b"] = _init_lnorm(d)
        params["decoder"].append(blk)
    return params


def _mm(y, w):
    return jnp.dot(y, w.astype(y.dtype), preferred_element_type=jnp.float32)


def _proj(y, a, name):
    out = _mm(y, a["w" + name])
    if "b" + name in a:
        out = out + a["b" + name]
    return out


def _heads(x, cfg: WhisperConfig):
    b, s, _ = x.shape
    return x.reshape(b, s, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)


def _attend(q, k, v, mask):
    """SDPA with Whisper's q-side scaling already applied by the caller."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    if mask is not None:
        s = jnp.where(mask, s, jnp.float32(-1e30))
    prob = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", prob, v.astype(jnp.float32))


def _attn_out(x, a, q_in, kv_in, mask, cfg: WhisperConfig):
    b, t, d = q_in.shape
    scale = cfg.head_dim**-0.5
    q = _heads((_proj(q_in, a, "q") * scale).astype(q_in.dtype), cfg)
    k = _heads(_proj(kv_in, a, "k").astype(kv_in.dtype), cfg)
    v = _heads(_proj(kv_in, a, "v").astype(kv_in.dtype), cfg)
    attn = _attend(q, k, v, mask).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
    return x + _proj(attn, a, "o").astype(x.dtype)


def _mlp_out(x, blk, cfg: WhisperConfig):
    y = layer_norm(x, blk["mlp_norm"], blk["mlp_norm_b"], cfg.norm_eps)
    m = blk["mlp"]
    h = jax.nn.gelu(_mm(y, m["fc1"]) + m["fc1_b"],
                    approximate=False).astype(y.dtype)
    return x + (_mm(h, m["fc2"]) + m["fc2_b"]).astype(x.dtype)


def _conv1d(x, w, b, stride: int):
    """x (B, T, Cin), w (k, Cin, Cout), SAME-ish padding 1 (HF conv pad=1)."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32)
    return out + b


def whisper_encode(params, features, cfg: WhisperConfig):
    """features (B, n_mels, T) fp mel spectrogram (the HF input_features
    layout) -> (B, T//2, d_model)."""
    x = features.transpose(0, 2, 1).astype(cfg.act_dtype)  # (B, T, mels)
    x = jax.nn.gelu(_conv1d(x, params["conv1_w"], params["conv1_b"], 1),
                    approximate=False).astype(cfg.act_dtype)
    x = jax.nn.gelu(_conv1d(x, params["conv2_w"], params["conv2_b"], 2),
                    approximate=False).astype(cfg.act_dtype)
    x = x + params["enc_pos"][: x.shape[1]].astype(x.dtype)
    for blk in params["encoder"]:
        y = layer_norm(x, blk["attn_norm"], blk["attn_norm_b"], cfg.norm_eps)
        x = _attn_out(x, blk["attn"], y, y, None, cfg)
        x = _mlp_out(x, blk, cfg)
    return layer_norm(x, params["enc_final_norm"], params["enc_final_norm_b"],
                      cfg.norm_eps)


def whisper_decode(params, enc_out, tokens, cfg: WhisperConfig):
    """Teacher-forced decoder -> (B, T, d_model) before the tied head."""
    t = tokens.shape[1]
    x = params["embed"][tokens].astype(cfg.act_dtype)
    x = x + params["dec_pos"][:t].astype(x.dtype)
    pos = jnp.arange(t)
    causal = (pos[None, :] <= pos[:, None])[None, None]
    enc_out = enc_out.astype(cfg.act_dtype)
    for blk in params["decoder"]:
        y = layer_norm(x, blk["attn_norm"], blk["attn_norm_b"], cfg.norm_eps)
        x = _attn_out(x, blk["attn"], y, y, causal, cfg)
        y = layer_norm(x, blk["cross_norm"], blk["cross_norm_b"], cfg.norm_eps)
        x = _attn_out(x, blk["cross"], y, enc_out, None, cfg)
        x = _mlp_out(x, blk, cfg)
    return layer_norm(x, params["dec_final_norm"], params["dec_final_norm_b"],
                      cfg.norm_eps)


def whisper_forward(params, features, tokens, cfg: WhisperConfig):
    """(B, n_mels, T) x (B, Td) -> fp32 logits (B, Td, vocab); tied head."""
    enc = whisper_encode(params, features, cfg)
    x = whisper_decode(params, enc, tokens, cfg)
    return jnp.dot(x, params["embed"].T.astype(x.dtype),
                   preferred_element_type=jnp.float32)


def whisper_loss(params, features, labels, cfg: WhisperConfig):
    """Teacher forcing: inputs = [start, labels[:-1]]; IGNORE masked."""
    b = labels.shape[0]
    inp = jnp.concatenate(
        [jnp.full((b, 1), cfg.decoder_start_id, labels.dtype),
         labels[:, :-1]], axis=1)
    inp = jnp.where(inp == IGNORE, jnp.int32(0), inp)
    logits = whisper_forward(params, features, inp, cfg)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.maximum(labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, labels, IGNORE)


def make_whisper_train_step(cfg: WhisperConfig, oc=None):
    from .train import OptConfig, apply_update

    oc = oc or OptConfig(lr=1e-3)

    def step(params, opt_state, features, labels):
        loss, grads = jax.value_and_grad(whisper_loss)(
            params, features, labels, cfg)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# cached generation
# ---------------------------------------------------------------------------


def whisper_generate(params, features, cfg: WhisperConfig,
                     max_new_tokens: int = 32, prompt=None):
    """Greedy transcription, ONE compiled program (T5-style: encoder +
    cross-KV precompute + scanned cached decode).  `prompt` (B, P) int32
    optionally forces leading decoder tokens (the task/language prefix
    convention); generation continues after it.  Returns
    (B, max_new_tokens) int32; positions after EOS hold eos_id."""
    b = features.shape[0]
    p_len = 0 if prompt is None else prompt.shape[1]
    max_len = p_len + max_new_tokens + 1
    d = cfg.d_model

    @jax.jit
    def run(params, features, prompt):
        enc = whisper_encode(params, features, cfg)
        cross_kv = [
            {"k": _heads(_proj(enc, blk["cross"], "k").astype(enc.dtype), cfg),
             "v": _heads(_proj(enc, blk["cross"], "v").astype(enc.dtype), cfg)}
            for blk in params["decoder"]
        ]
        caches = [
            {"k": jnp.zeros((b, cfg.n_heads, max_len, cfg.head_dim),
                            cfg.act_dtype),
             "v": jnp.zeros((b, cfg.n_heads, max_len, cfg.head_dim),
                            cfg.act_dtype)}
            for _ in range(cfg.n_dec_layers)
        ]

        def decode_one(tok, pos, caches):
            """One token at traced position pos -> (logits, caches)."""
            x = params["embed"][tok[:, None]].astype(cfg.act_dtype)
            x = x + jax.lax.dynamic_slice(
                params["dec_pos"], (pos, 0), (1, d)).astype(x.dtype)
            kpos = jnp.arange(max_len)
            smask = (kpos <= pos)[None, None, None, :]
            scale = cfg.head_dim**-0.5
            new_caches = []
            for blk, cache, ckv in zip(params["decoder"], caches, cross_kv):
                y = layer_norm(x, blk["attn_norm"], blk["attn_norm_b"],
                               cfg.norm_eps)
                a = blk["attn"]
                q = _heads((_proj(y, a, "q") * scale).astype(y.dtype), cfg)
                k = _heads(_proj(y, a, "k").astype(y.dtype), cfg)
                v = _heads(_proj(y, a, "v").astype(y.dtype), cfg)
                zero = jnp.int32(0)
                idx = (zero, zero, pos.astype(jnp.int32), zero)
                kc = jax.lax.dynamic_update_slice(cache["k"], k, idx)
                vc = jax.lax.dynamic_update_slice(cache["v"], v, idx)
                new_caches.append({"k": kc, "v": vc})
                attn = _attend(q, kc, vc, smask).astype(x.dtype)
                attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, d)
                x = x + _proj(attn, a, "o").astype(x.dtype)

                y = layer_norm(x, blk["cross_norm"], blk["cross_norm_b"],
                               cfg.norm_eps)
                q = _heads((_proj(y, blk["cross"], "q") * scale
                            ).astype(y.dtype), cfg)
                attn = _attend(q, ckv["k"], ckv["v"], None).astype(x.dtype)
                attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, d)
                x = x + _proj(attn, blk["cross"], "o").astype(x.dtype)
                x = _mlp_out(x, blk, cfg)
            x = layer_norm(x, params["dec_final_norm"],
                           params["dec_final_norm_b"], cfg.norm_eps)
            logits = jnp.dot(x[:, 0], params["embed"].T.astype(x.dtype),
                             preferred_element_type=jnp.float32)
            return logits, new_caches

        tok0 = jnp.full((b,), cfg.decoder_start_id, jnp.int32)
        if p_len:
            # force the prompt: feed [start, prompt[:-1]], ignore logits
            def force(carry, i):
                tok, caches = carry
                _, caches = decode_one(tok, i, caches)  # logits discarded
                return (prompt.T[i], caches), None

            (tok, caches), _ = jax.lax.scan(
                force, (tok0, caches), jnp.arange(p_len))
            start, first = jnp.int32(p_len), tok
        else:
            start, first = jnp.int32(0), tok0

        def step(carry, i):
            tok, caches, done = carry
            logits, caches = decode_one(tok, start + i, caches)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out = jnp.where(done, jnp.int32(cfg.eos_id), nxt)
            done = done | (nxt == cfg.eos_id)
            return (out, caches, done), out

        (_, _, _), toks = jax.lax.scan(
            step, (first, caches, jnp.zeros((b,), bool)),
            jnp.arange(max_new_tokens))
        return toks.T

    prompt = (jnp.zeros((b, 0), jnp.int32) if prompt is None
              else prompt.astype(jnp.int32))
    return run(params, features, prompt)


# ---------------------------------------------------------------------------
# HuggingFace interop (WhisperForConditionalGeneration)
# ---------------------------------------------------------------------------


def config_from_hf_whisper(hf_config, dtype: str = "bfloat16"
                           ) -> WhisperConfig:
    g = (lambda k, d=None: hf_config.get(k, d)) if isinstance(
        hf_config, dict) else (lambda k, d=None: getattr(hf_config, k, d))
    return WhisperConfig(
        vocab_size=g("vocab_size"),
        n_mels=g("num_mel_bins", 80),
        d_model=g("d_model"),
        n_heads=g("encoder_attention_heads"),
        n_enc_layers=g("encoder_layers"),
        n_dec_layers=g("decoder_layers"),
        d_ff=g("encoder_ffn_dim"),
        max_source_positions=g("max_source_positions", 1500),
        max_target_positions=g("max_target_positions", 448),
        dtype=dtype,
        decoder_start_id=g("decoder_start_token_id", 0) or 0,
        eos_id=g("eos_token_id", 1) or 1,
    )


def _hf_attn(sd, prefix):
    from .hf import _np

    a = {
        "wq": jnp.asarray(_np(sd[f"{prefix}.q_proj.weight"]).T),
        "bq": jnp.asarray(_np(sd[f"{prefix}.q_proj.bias"])),
        "wk": jnp.asarray(_np(sd[f"{prefix}.k_proj.weight"]).T),
        "wv": jnp.asarray(_np(sd[f"{prefix}.v_proj.weight"]).T),
        "bv": jnp.asarray(_np(sd[f"{prefix}.v_proj.bias"])),
        "wo": jnp.asarray(_np(sd[f"{prefix}.out_proj.weight"]).T),
        "bo": jnp.asarray(_np(sd[f"{prefix}.out_proj.bias"])),
    }
    return a


def params_from_hf_whisper(state_dict, cfg: WhisperConfig):
    """WhisperForConditionalGeneration state_dict -> our pytree (fp32).
    torch Conv1d weight (out, in, k) -> (k, in, out); Linears transpose."""
    from .hf import _np

    sd = state_dict
    params = {
        "conv1_w": jnp.asarray(
            _np(sd["model.encoder.conv1.weight"]).transpose(2, 1, 0)),
        "conv1_b": jnp.asarray(_np(sd["model.encoder.conv1.bias"])),
        "conv2_w": jnp.asarray(
            _np(sd["model.encoder.conv2.weight"]).transpose(2, 1, 0)),
        "conv2_b": jnp.asarray(_np(sd["model.encoder.conv2.bias"])),
        "enc_pos": jnp.asarray(
            _np(sd["model.encoder.embed_positions.weight"])),
        "embed": jnp.asarray(_np(sd["model.decoder.embed_tokens.weight"])),
        "dec_pos": jnp.asarray(
            _np(sd["model.decoder.embed_positions.weight"])),
        "enc_final_norm": jnp.asarray(
            _np(sd["model.encoder.layer_norm.weight"])),
        "enc_final_norm_b": jnp.asarray(
            _np(sd["model.encoder.layer_norm.bias"])),
        "dec_final_norm": jnp.asarray(
            _np(sd["model.decoder.layer_norm.weight"])),
        "dec_final_norm_b": jnp.asarray(
            _np(sd["model.decoder.layer_norm.bias"])),
        "encoder": [], "decoder": [],
    }

    def norms(blk, our, hf_prefix):
        blk[our] = jnp.asarray(_np(sd[hf_prefix + ".weight"]))
        blk[our + "_b"] = jnp.asarray(_np(sd[hf_prefix + ".bias"]))

    def mlp(prefix):
        return {
            "fc1": jnp.asarray(_np(sd[f"{prefix}.fc1.weight"]).T),
            "fc1_b": jnp.asarray(_np(sd[f"{prefix}.fc1.bias"])),
            "fc2": jnp.asarray(_np(sd[f"{prefix}.fc2.weight"]).T),
            "fc2_b": jnp.asarray(_np(sd[f"{prefix}.fc2.bias"])),
        }

    for i in range(cfg.n_enc_layers):
        lp = f"model.encoder.layers.{i}"
        blk = {"attn": _hf_attn(sd, f"{lp}.self_attn"), "mlp": mlp(lp)}
        norms(blk, "attn_norm", f"{lp}.self_attn_layer_norm")
        norms(blk, "mlp_norm", f"{lp}.final_layer_norm")
        params["encoder"].append(blk)
    for i in range(cfg.n_dec_layers):
        lp = f"model.decoder.layers.{i}"
        blk = {"attn": _hf_attn(sd, f"{lp}.self_attn"),
               "cross": _hf_attn(sd, f"{lp}.encoder_attn"), "mlp": mlp(lp)}
        norms(blk, "attn_norm", f"{lp}.self_attn_layer_norm")
        norms(blk, "cross_norm", f"{lp}.encoder_attn_layer_norm")
        norms(blk, "mlp_norm", f"{lp}.final_layer_norm")
        params["decoder"].append(blk)
    return params


def from_hf_whisper(model_or_path, dtype: str = "bfloat16"):
    if isinstance(model_or_path, (str, bytes)) or hasattr(
            model_or_path, "__fspath__"):
        from transformers import WhisperForConditionalGeneration

        model = WhisperForConditionalGeneration.from_pretrained(model_or_path)
    else:
        model = model_or_path
    cfg = config_from_hf_whisper(model.config, dtype=dtype)
    return params_from_hf_whisper(model.state_dict(), cfg), cfg


# ---------------------------------------------------------------------------
# mesh parallelism (dp x tp)
# ---------------------------------------------------------------------------


def whisper_param_specs(params) -> dict:
    """Megatron-style TP over the (dp, tp) mesh: q/k/v column-parallel
    (heads over tp; their biases shard with them, except bias-free k),
    out row-parallel (bias replicated), fc1 column / fc2 row, conv
    frontend sharded over its OUTPUT channels, norms and position tables
    replicated.  Forward parity pinned on the 8-device CPU mesh
    (tests/test_whisper.py::TestMesh)."""
    from jax.sharding import PartitionSpec as P

    def attn_spec():
        return {"wq": P(None, "tp"), "bq": P("tp"),
                "wk": P(None, "tp"),
                "wv": P(None, "tp"), "bv": P("tp"),
                "wo": P("tp", None), "bo": P()}

    def mlp_spec():
        return {"fc1": P(None, "tp"), "fc1_b": P("tp"),
                "fc2": P("tp", None), "fc2_b": P()}

    def enc_blk():
        return {"attn": attn_spec(), "mlp": mlp_spec(),
                "attn_norm": P(), "attn_norm_b": P(),
                "mlp_norm": P(), "mlp_norm_b": P()}

    def dec_blk():
        return enc_blk() | {"cross": attn_spec(),
                            "cross_norm": P(), "cross_norm_b": P()}

    return {
        "conv1_w": P(None, None, "tp"), "conv1_b": P("tp"),
        "conv2_w": P(None, "tp", None), "conv2_b": P(),
        "enc_pos": P(), "dec_pos": P(),
        "embed": P(None, "tp"),
        "enc_final_norm": P(), "enc_final_norm_b": P(),
        "dec_final_norm": P(), "dec_final_norm_b": P(),
        "encoder": [enc_blk() for _ in params["encoder"]],
        "decoder": [dec_blk() for _ in params["decoder"]],
    }


def shard_whisper_params(params, mesh):
    from jax.sharding import NamedSharding

    specs = whisper_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)))
