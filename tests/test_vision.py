"""Vision encoder + multimodal LM tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.transformer import TransformerConfig
from kfunca_tpu.models.vision import (
    MultimodalConfig,
    ViTConfig,
    init_multimodal_params,
    init_vit_params,
    multimodal_forward,
    multimodal_loss,
    patchify,
    vit_encode,
)


def tiny_vit():
    return ViTConfig(
        image_size=16, patch_size=4, channels=3, d_model=32, n_heads=2,
        n_layers=2, d_ff=64, dtype="float32",
    )


def tiny_mm():
    return MultimodalConfig(
        vit=tiny_vit(),
        text=TransformerConfig(
            vocab_size=64, d_model=32, n_heads=2, n_layers=2, d_ff=64,
            dtype="float32",
        ),
    )


class TestViT:
    def test_patchify_exact_blocks(self):
        """patchify must be the exact non-overlapping block decomposition."""
        cfg = tiny_vit()
        img = jnp.arange(16 * 16 * 3, dtype=jnp.float32).reshape(1, 16, 16, 3)
        patches = patchify(img, cfg)
        assert patches.shape == (1, 16, 48)
        # patch (row 0, col 1) covers columns 4:8 of rows 0:4
        want = np.asarray(img)[0, 0:4, 4:8, :].reshape(-1)
        assert np.array_equal(np.asarray(patches)[0, 1], want)

    def test_encode_shapes(self):
        cfg = tiny_vit()
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3), jnp.float32)
        feats = vit_encode(params, img, cfg)
        assert feats.shape == (2, cfg.n_patches, cfg.d_model)
        assert bool(jnp.isfinite(feats).all())

    @pytest.mark.slow
    def test_position_sensitivity(self):
        """Same patches in a different spatial arrangement must encode
        differently (positional embeddings are live)."""
        cfg = tiny_vit()
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3), jnp.float32)
        rolled = jnp.roll(img, cfg.patch_size, axis=2)  # shift by one patch col
        a = vit_encode(params, img, cfg)
        b = vit_encode(params, rolled, cfg)
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestMultimodal:
    def test_forward_shapes_and_conditioning(self):
        cfg = tiny_mm()
        params = init_multimodal_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3), jnp.float32)
        tokens = jnp.ones((2, 8), jnp.int32)
        logits = multimodal_forward(params, img, tokens, cfg)
        assert logits.shape == (2, 8, cfg.text.vocab_size)
        # the image must influence the text logits (cross-modal attention)
        img2 = img + 1.0
        logits2 = multimodal_forward(params, img2, tokens, cfg)
        assert not np.allclose(np.asarray(logits), np.asarray(logits2), atol=1e-4)

    @pytest.mark.slow
    def test_train_step_learns(self):
        cfg = tiny_mm()
        params = init_multimodal_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3), jnp.float32)
        tokens = (jnp.arange(2 * 8, dtype=jnp.int32).reshape(2, 8) * 3) % cfg.text.vocab_size
        targets = (tokens + 1) % cfg.text.vocab_size

        loss_grad = jax.jit(
            jax.value_and_grad(lambda p: multimodal_loss(p, img, tokens, targets, cfg))
        )
        params_flat, treedef = jax.tree_util.tree_flatten(params)
        losses = []
        for _ in range(5):
            loss, grads = loss_grad(params)
            losses.append(float(loss))
            params = jax.tree_util.tree_map(lambda p, g: p - 0.05 * g, params, grads)
        assert losses[-1] < losses[0]
        # gradients reach the vision tower, not just the text head
        _, grads = loss_grad(params)
        g_patch = np.asarray(grads["vit"]["patch_proj"])
        assert np.abs(g_patch).max() > 0
