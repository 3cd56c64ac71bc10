"""LoRA finetuning (models/lora.py): zero-start identity, frozen-base
training, merge parity, serving-adapter export, and MoE target gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.generate import generate
from kfunca_tpu.models.lora import (
    attach_lora,
    init_lora,
    make_lora_train_step,
    merge_lora,
    to_serving,
)
from kfunca_tpu.models.serve import InferenceServer
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


class TestLoRAForward:
    def test_zero_adapters_are_identity(self):
        """B starts at zeros -> attached forward == base forward exactly."""
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        ad = init_lora(jax.random.PRNGKey(1), cfg, rank=4,
                       targets=("wqkv", "wo", "w_gate", "w_up", "w_down"))
        tok, _ = toy_batch(cfg)
        base = forward(params, tok, cfg)
        attached = forward(attach_lora(params, ad), tok, cfg)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(attached))

    def test_nonzero_adapters_change_output_and_merge_matches(self):
        """Random B: attached forward != base, and merge_lora reproduces the
        attached (unmerged) forward."""
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        ad = init_lora(jax.random.PRNGKey(1), cfg, rank=4,
                       targets=("wqkv", "wo", "w_down"), alpha=8)
        assert ad["scale"] == pytest.approx(2.0)  # alpha/r
        key = jax.random.PRNGKey(2)
        for blk in ad["blocks"]:
            for t, ab in blk.items():
                key, k = jax.random.split(key)
                ab["B"] = 0.05 * jax.random.normal(k, ab["B"].shape, jnp.float32)
        tok, _ = toy_batch(cfg)
        base = np.asarray(forward(params, tok, cfg))
        attached = np.asarray(forward(attach_lora(params, ad), tok, cfg))
        merged = np.asarray(forward(merge_lora(params, ad), tok, cfg))
        assert np.abs(attached - base).max() > 1e-4
        np.testing.assert_allclose(merged, attached, rtol=1e-5, atol=1e-5)

    def test_unknown_target_rejected(self):
        from kfunca_tpu.utils.errors import KfError

        with pytest.raises(KfError):
            init_lora(jax.random.PRNGKey(0), small_cfg(), targets=("embed",))

    def test_moe_mlp_targets_rejected(self):
        cfg = small_cfg(n_experts=4, moe_top_k=2)
        with pytest.raises(NotImplementedError):
            init_lora(jax.random.PRNGKey(0), cfg, targets=("wqkv", "w_gate"))
        # attention targets are fine on MoE configs
        ad = init_lora(jax.random.PRNGKey(0), cfg, targets=("wqkv", "wo"))
        params = init_params(jax.random.PRNGKey(1), cfg)
        tok, _ = toy_batch(cfg)
        base = forward(params, tok, cfg)
        attached = forward(attach_lora(params, ad), tok, cfg)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(attached))


class TestLoRATraining:
    def test_train_step_freezes_base_and_learns(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        base_flat = [np.asarray(x).copy()
                     for x in jax.tree_util.tree_leaves(params)]
        ad = init_lora(jax.random.PRNGKey(1), cfg, rank=4,
                       targets=("wqkv", "wo"))
        opt = init_opt_state(ad["blocks"])
        step = jax.jit(make_lora_train_step(
            params, cfg, OptConfig(lr=5e-2, weight_decay=0.0)))
        tok, tgt = toy_batch(cfg)
        losses = []
        for _ in range(8):
            ad, opt, loss = step(ad, opt, tok, tgt)
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < losses[0]
        # the base is bit-identical after training
        for before, leaf in zip(base_flat, jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(before, np.asarray(leaf))
        # adapters actually moved
        moved = max(float(jnp.abs(ab["B"]).max())
                    for blk in ad["blocks"] for ab in blk.values())
        assert moved > 0

    def test_opt_state_is_adapter_sized(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        ad = init_lora(jax.random.PRNGKey(1), cfg, rank=4)
        opt = init_opt_state(ad["blocks"])
        n_opt = sum(int(np.prod(x.shape))
                    for x in jax.tree_util.tree_leaves(opt))
        n_base = sum(int(np.prod(x.shape))
                     for x in jax.tree_util.tree_leaves(params))
        assert n_opt < n_base / 4  # O(adapter), not O(model)

    def test_chunked_loss_path(self):
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        ad = init_lora(jax.random.PRNGKey(1), cfg, rank=4)
        opt = init_opt_state(ad["blocks"])
        step = jax.jit(make_lora_train_step(
            params, cfg, OptConfig(lr=1e-2, weight_decay=0.0), loss_chunk=32))
        tok, tgt = toy_batch(cfg)
        ad, opt, loss = step(ad, opt, tok, tgt)
        assert np.isfinite(float(loss))


class TestLoRAServing:
    def test_trained_adapter_serves_paged(self):
        """register_lora(to_serving(ad)) decode == dense generate on
        merge_lora'd params — the full train->serve loop, token-exact."""
        cfg = small_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        ad = init_lora(jax.random.PRNGKey(1), cfg, rank=4, targets=("wqkv",))
        opt = init_opt_state(ad["blocks"])
        step = jax.jit(make_lora_train_step(
            params, cfg, OptConfig(lr=5e-2, weight_decay=0.0)))
        tok, tgt = toy_batch(cfg)
        for _ in range(4):
            ad, opt, _ = step(ad, opt, tok, tgt)

        dense = np.asarray(
            generate(merge_lora(params, ad), tok[:1, :8], cfg, 10))[0, -10:]
        srv = InferenceServer(params, cfg, batch_slots=2, n_pages=64,
                              page_size=8, max_loras=2,
                              lora_rank=4)
        lid = srv.register_lora(to_serving(ad))
        rid = srv.submit(np.asarray(tok[0, :8]), max_new=10, lora_id=lid)
        srv.run()
        np.testing.assert_array_equal(dense, np.asarray(srv.requests[rid].tokens))

    def test_to_serving_requires_wqkv_only(self):
        cfg = small_cfg()
        ad = init_lora(jax.random.PRNGKey(0), cfg, targets=("wqkv", "wo"))
        with pytest.raises(NotImplementedError):
            to_serving(ad)
