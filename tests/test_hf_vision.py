"""HF ViT import parity: the imported pre-norm LayerNorm/GELU ViT must
reproduce transformers' ViTModel hidden states and pooler output (the
conv patch embedding imported as an MXU matmul)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from kfunca_tpu.models.hf_vision import (  # noqa: E402
    from_hf_vit,
    hf_vit_encode,
    hf_vit_pooled,
)


def _mk(seed=6):
    from transformers import ViTConfig, ViTModel

    hc = ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8, num_channels=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    return ViTModel(hc).eval()


class TestViTImport:
    def test_hidden_states_and_pooler_match(self):
        model = _mk()
        params, cfg = from_hf_vit(model)
        assert cfg.n_patches == 16 and "pooler_w" in params
        rng = np.random.default_rng(6)
        # HF feeds (B, C, H, W); ours takes (B, H, W, C)
        chw = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = model(torch.tensor(chw))
        imgs = jnp.asarray(np.transpose(chw, (0, 2, 3, 1)))
        got = np.asarray(hf_vit_encode(params, imgs, cfg))
        ref = want.last_hidden_state.float().numpy()
        assert got.shape == ref.shape  # (B, N+1, d) with CLS at slot 0
        assert np.allclose(got, ref, atol=2e-4), np.abs(got - ref).max()
        pooled = np.asarray(hf_vit_pooled(params, imgs, cfg))
        refp = want.pooler_output.float().numpy()
        assert np.allclose(pooled, refp, atol=2e-4), \
            np.abs(pooled - refp).max()

    def test_patch_matmul_equals_conv(self):
        """The reordered (p*p*C, d) matmul weight reproduces the stride-p
        conv patch embedding exactly."""
        model = _mk(seed=7)
        params, cfg = from_hf_vit(model)
        rng = np.random.default_rng(7)
        chw = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = model.embeddings.patch_embeddings(
                torch.tensor(chw)).numpy()  # (B, N, d)
        from kfunca_tpu.models.hf_vision import _patchify

        imgs = jnp.asarray(np.transpose(chw, (0, 2, 3, 1)))
        x = _patchify(imgs, cfg)
        got = np.asarray(x @ params["patch_w"] + params["patch_b"])
        assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()
