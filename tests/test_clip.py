"""CLIP dual-encoder contrastive training (models/clip.py): encoder
contracts, loss at init, training dynamics, and sharded-global-batch
equivalence on the 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kfunca_tpu.models.clip import (
    ClipConfig,
    clip_loss,
    clip_loss_sharded,
    encode_image,
    encode_text,
    init_clip_params,
    make_clip_train_step,
)
from kfunca_tpu.models.train import init_opt_state
from kfunca_tpu.models.transformer import TransformerConfig
from kfunca_tpu.models.vision import ViTConfig


def small_cfg():
    return ClipConfig(
        vit=ViTConfig(image_size=16, patch_size=8, d_model=32, n_heads=2,
                      n_layers=1, d_ff=64, dtype="float32"),
        text=TransformerConfig(vocab_size=64, d_model=32, n_heads=2,
                               n_layers=1, d_ff=64, dtype="float32"),
        embed_dim=16,
    )


def batch(cfg, b=8, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.normal(size=(b, 16, 16, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 64, (b, 6)), jnp.int32)
    return images, tokens


class TestEncoders:
    def test_unit_norm_and_shapes(self):
        cfg = small_cfg()
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        images, tokens = batch(cfg)
        img = encode_image(params, images, cfg)
        txt = encode_text(params, tokens, cfg)
        assert img.shape == (8, 16) and txt.shape == (8, 16)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(img), axis=-1),
                                   1.0, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(txt), axis=-1),
                                   1.0, rtol=1e-5)


class TestLoss:
    def test_init_loss_and_scale(self):
        """Untrained: finite loss, chance-level retrieval, CLIP scale
        init (the 1/0.07 temperature amplifies random cosine sims, so the
        loss sits ABOVE log(B) — not near-uniform)."""
        cfg = small_cfg()
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        loss, m = clip_loss(params, *batch(cfg), cfg)
        assert np.isfinite(float(loss)) and float(loss) >= np.log(8) - 0.5
        assert float(m["acc_i2t"]) <= 0.5  # chance-ish on 8 pairs
        assert float(m["logit_scale"]) == np.float32(1 / 0.07).item()

    def test_training_aligns_pairs(self):
        cfg = small_cfg()
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        opt = init_opt_state(params)
        from kfunca_tpu.models.train import OptConfig

        step = jax.jit(make_clip_train_step(cfg, OptConfig(lr=3e-3,
                                                           weight_decay=0.0)))
        images, tokens = batch(cfg)
        hist = []
        for _ in range(30):
            params, opt, m = step(params, opt, images, tokens)
            hist.append({k: float(v) for k, v in m.items()})
        assert hist[-1]["loss"] < hist[0]["loss"]
        assert hist[-1]["acc_i2t"] == 1.0  # tiny model memorizes the batch

    def test_logit_scale_clamped_and_learned(self):
        cfg = small_cfg()
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        s0 = float(params["logit_scale"])
        params = dict(params, logit_scale=jnp.asarray(99.0, jnp.float32))
        _, m = clip_loss(params, *batch(cfg), cfg)
        np.testing.assert_allclose(float(m["logit_scale"]), 100.0,
                                   rtol=1e-6)  # clamped at 100
        # and it moves under training
        params["logit_scale"] = jnp.asarray(s0, jnp.float32)
        opt = init_opt_state(params)
        step = jax.jit(make_clip_train_step(cfg))
        images, tokens = batch(cfg)
        for _ in range(3):
            params, opt, _ = step(params, opt, images, tokens)
        assert float(params["logit_scale"]) != s0


class TestSharded:
    def test_sharded_equals_global_single_device(self):
        """dp=8 sharded loss (all_gathered negatives, offset labels) ==
        the single-device loss on the concatenated global batch."""
        cfg = small_cfg()
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        images, tokens = batch(cfg, b=16, seed=3)  # 2 per device

        want, _ = clip_loss(params, images, tokens, cfg)

        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
        sharded = shard_map(
            lambda p, im, tk: clip_loss_sharded(p, im, tk, cfg, "dp"),
            mesh=mesh,
            in_specs=(P(), P("dp"), P("dp")),
            out_specs=P(),
        )
        imgs = jax.device_put(images, NamedSharding(mesh, P("dp")))
        tks = jax.device_put(tokens, NamedSharding(mesh, P("dp")))
        got = jax.jit(sharded)(params, imgs, tks)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_sharded_grads_match_global(self):
        """Gradients through the all_gather match the single-device global
        batch (the transpose psum-scatter path is exact)."""
        cfg = small_cfg()
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        images, tokens = batch(cfg, b=16, seed=5)

        g_want = jax.grad(
            lambda p: clip_loss(p, images, tokens, cfg)[0])(params)

        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))

        def sharded_loss(p, im, tk):
            return clip_loss_sharded(p, im, tk, cfg, "dp")

        smapped = shard_map(sharded_loss, mesh=mesh,
                            in_specs=(P(), P("dp"), P("dp")), out_specs=P())
        imgs = jax.device_put(images, NamedSharding(mesh, P("dp")))
        tks = jax.device_put(tokens, NamedSharding(mesh, P("dp")))
        g_got = jax.jit(jax.grad(lambda p: smapped(p, imgs, tks)))(params)
        for a, b_ in zip(jax.tree_util.tree_leaves(g_want),
                         jax.tree_util.tree_leaves(g_got)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)
