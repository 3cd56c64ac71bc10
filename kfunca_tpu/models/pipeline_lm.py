"""Pipelined Mixture-of-Experts transformer LM: the full-parallelism model.

Composes every scale-out axis in one training step (green-field; the
reference is single-device):

  dp — batch/microbatch data parallelism (GSPMD auto)
  tp — Megatron tensor parallelism on attention/FFN weights (GSPMD auto)
  ep — experts sharded over the tp axis in the MoE FFN (all-to-all dispatch)
  pp — GPipe microbatch pipeline over mesh axis "pp" (manual shard_map +
       ppermute, parallel/pipeline.py)
  sp — sequence-parallel activation resharding on the dense path
       (parallel/mesh.py activation_spec)

Blocks are attention + MoE-FFN; embedding and LM head live outside the
pipeline (stage-0/last-stage work is uniform SPMD, the classic embedding-
outside-pipeline layout).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.pipeline import make_pipelined_forward, stack_stages
from .moe import MoEConfig, init_moe_params, moe_ffn
from .transformer import _rope, rms_norm
from ..ops.attention import causal_attention_fn


@dataclass(frozen=True)
class PipelineMoEConfig:
    vocab_size: int = 256
    d_model: int = 128
    n_heads: int = 2
    n_layers: int = 4
    n_experts: int = 4
    d_ff: int = 256
    n_stages: int = 2
    n_microbatches: int = 2
    dtype: str = "bfloat16"

    @property
    def head_dim(self):
        return self.d_model // self.n_heads

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def moe(self) -> MoEConfig:
        return MoEConfig(
            n_experts=self.n_experts, d_model=self.d_model, d_ff=self.d_ff
        )


def _init_linear(key, fan_in, fan_out):
    s = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -s, s)


def init_params(key, cfg: PipelineMoEConfig):
    keys = jax.random.split(key, cfg.n_layers + 1)
    blocks = []
    for i in range(cfg.n_layers):
        k = jax.random.split(keys[i + 1], 4)
        blocks.append(
            {
                "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
                "wqkv": _init_linear(k[0], cfg.d_model, 3 * cfg.d_model),
                "wo": _init_linear(k[1], cfg.d_model, cfg.d_model),
                "mlp_norm": jnp.ones((cfg.d_model,), jnp.float32),
                "moe": init_moe_params(k[2], cfg.moe),
            }
        )
    return {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, cfg.d_model), jnp.float32) * 0.02,
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "stages": stack_stages(blocks, cfg.n_stages),
    }


def block_fn(cfg: PipelineMoEConfig, layer_params, x):
    """One attention + MoE-FFN layer; x: (mb, S, D)."""
    p = layer_params
    b, s, dm = x.shape
    h, hd = cfg.n_heads, cfg.head_dim

    y = rms_norm(x, p["attn_norm"])
    qkv = jnp.dot(y, p["wqkv"].astype(y.dtype), preferred_element_type=jnp.float32)
    qkv = qkv.astype(y.dtype).reshape(b, s, 3, h, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    q, k = _rope(q, 10000.0), _rope(k, 10000.0)
    attn = causal_attention_fn(q, k, v).transpose(0, 2, 1, 3).reshape(b, s, dm)
    x = x + jnp.dot(
        attn, p["wo"].astype(attn.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)

    y = rms_norm(x, p["mlp_norm"])
    ffn, _aux = moe_ffn(y, p["moe"], cfg.moe)
    return x + ffn


def make_loss_fn(cfg: PipelineMoEConfig, mesh):
    pipelined = make_pipelined_forward(
        lambda lp, x: block_fn(cfg, lp, x), mesh, pp_axis="pp"
    )

    def loss_fn(params, tokens, targets):
        b, s = tokens.shape
        m = cfg.n_microbatches
        mb = b // m
        from .transformer import embed_tokens

        x = embed_tokens(params, tokens, cfg)  # (B, S, D)
        x_mb = x.reshape(m, mb, s, cfg.d_model)
        y_mb = pipelined(params["stages"], x_mb)  # (M, mb, S, D)
        y = y_mb.reshape(b, s, cfg.d_model)
        y = rms_norm(y, params["final_norm"])
        logits = jnp.dot(
            y, params["embed"].T.astype(y.dtype), preferred_element_type=jnp.float32
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))

    return loss_fn


def param_specs(cfg: PipelineMoEConfig) -> dict:
    """pp on the stage axis; tp on head/ffn dims; experts over tp (=ep)."""
    return {
        "embed": P(None, "tp"),
        "final_norm": P(),
        "stages": {
            "attn_norm": P("pp"),
            "wqkv": P("pp", None, None, "tp"),
            "wo": P("pp", None, "tp", None),
            "mlp_norm": P("pp"),
            "moe": {
                "router": P("pp", None, None, None),
                "w_in": P("pp", None, "tp", None, None),
                "w_out": P("pp", None, "tp", None, None),
            },
        },
    }


def make_train_step(cfg: PipelineMoEConfig, mesh, lr: float = 1e-3):
    """SGD train step, jitted with full dp/tp/ep/pp shardings."""
    loss_fn = make_loss_fn(cfg, mesh)

    def step(params, tokens, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets)
        params = jax.tree_util.tree_map(
            lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype), params, grads
        )
        return params, loss

    specs = param_specs(cfg)
    to_sh = lambda s: NamedSharding(mesh, s)
    p_sh = jax.tree_util.tree_map(to_sh, specs, is_leaf=lambda x: isinstance(x, P))
    batch_sh = NamedSharding(mesh, P("dp", None))
    return jax.jit(
        step,
        in_shardings=(p_sh, batch_sh, batch_sh),
        out_shardings=(p_sh, NamedSharding(mesh, P())),
    )
