"""QLoRA: LoRA training over an int8/int4-quantized frozen base
(models/lora.quantize_base + the dequant dispatch in transformer)."""

import numpy as np

import jax
import jax.numpy as jnp

from kfunca_tpu.models.lora import (
    init_lora,
    make_lora_train_step,
    merge_lora,
    quantize_base,
)
from kfunca_tpu.models.train import OptConfig, init_opt_state
from kfunca_tpu.models.transformer import TransformerConfig, forward, init_params


def small_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_ff", 64)
    kw.setdefault("dtype", "float32")
    return TransformerConfig(**kw)


def toy_batch(cfg, b=2, s=16):
    tok = (jnp.arange(b * s, dtype=jnp.int32).reshape(b, s) * 7) % cfg.vocab_size
    return tok, jnp.roll(tok, -1, axis=1)


class TestQuantizedBaseForward:
    def test_int8_forward_close_to_fp(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        qparams = quantize_base(params, bits=8)
        blk = qparams["blocks"][0]
        assert isinstance(blk["wqkv"], tuple)
        assert blk["wqkv"][0].dtype == jnp.int8
        assert not isinstance(blk["attn_norm"], tuple)  # norms stay fp
        tok, _ = toy_batch(cfg)
        fp = np.asarray(forward(params, tok, cfg))
        q8 = np.asarray(forward(qparams, tok, cfg))
        # per-column int8 weight noise: logits stay close, not exact
        assert np.abs(fp - q8).max() < 0.15 * (np.abs(fp).max() + 1)

    def test_int4_forward_runs(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        q4 = quantize_base(params, bits=4)
        assert q4["blocks"][0]["wqkv"][0].dtype == jnp.int4
        tok, _ = toy_batch(cfg)
        out = forward(q4, tok, cfg)
        assert bool(jnp.isfinite(out).all())

    def test_memory_shrinks(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)

        def block_bytes(p):
            tot = 0
            for blk in p["blocks"]:
                for v in blk.values():
                    leaves = v if isinstance(v, tuple) else (v,)
                    tot += sum(x.size * x.dtype.itemsize for x in leaves)
            return tot

        fp_b = block_bytes(params)
        q8_b = block_bytes(quantize_base(params, bits=8))
        assert q8_b < 0.3 * fp_b  # ~4x smaller (+ tiny scales)


class TestQLoRATraining:
    def test_trains_and_base_frozen(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        qbase = quantize_base(params, bits=8)
        before = [np.asarray(x).copy()
                  for x in jax.tree_util.tree_leaves(qbase)]
        ad = init_lora(jax.random.PRNGKey(1), cfg, rank=4,
                       targets=("wqkv", "wo"))
        opt = init_opt_state(ad["blocks"])
        step = jax.jit(make_lora_train_step(
            qbase, cfg, OptConfig(lr=5e-2, weight_decay=0.0)))
        tok, tgt = toy_batch(cfg)
        losses = []
        for _ in range(8):
            ad, opt, loss = step(ad, opt, tok, tgt)
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < losses[0]
        for b4, leaf in zip(before, jax.tree_util.tree_leaves(qbase)):
            np.testing.assert_array_equal(b4, np.asarray(leaf))

    def test_merge_onto_fp_base_serves(self):
        """Adapters trained on the quantized base merge onto the ORIGINAL
        fp checkpoint for deployment (the documented workflow)."""
        from kfunca_tpu.models.generate import generate

        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        qbase = quantize_base(params, bits=8)
        ad = init_lora(jax.random.PRNGKey(1), cfg, rank=4)
        opt = init_opt_state(ad["blocks"])
        step = jax.jit(make_lora_train_step(
            qbase, cfg, OptConfig(lr=5e-2, weight_decay=0.0)))
        tok, tgt = toy_batch(cfg)
        for _ in range(3):
            ad, opt, _ = step(ad, opt, tok, tgt)
        merged = merge_lora(params, ad)
        out = generate(merged, tok[:1, :8], cfg, 6)
        assert np.asarray(out).shape[1] >= 6
