"""DiT: diffusion transformer for class-conditional image generation.

Completes the generative half of the "multimodal transformers" scope
(/root/reference/README.md:2): models/vision.py + clip.py cover image
UNDERSTANDING; this is image GENERATION — a Diffusion Transformer
(Peebles & Xie 2023) with adaLN-Zero conditioning, DDPM epsilon-prediction
training, and a DDIM sampler with classifier-free guidance.

TPU-first construction:
  * patches are block reshapes + one MXU matmul (vision.patchify — no
    conv); the denoiser is pure transformer blocks, so all FLOPs are
    MXU-shaped.
  * adaLN-Zero: each block's modulation MLP and the final projection are
    ZERO-initialized, so every block starts as identity and the model
    output starts at exactly 0 — the residual path dominates early
    training (pinned in tests/test_dit.py).
  * the sampler is ONE compiled program: a lax.scan over a static step
    subset, schedule constants gathered by traced index — no Python loop
    over timesteps, no recompiles per step count.
  * conditioning (timestep sinusoid + class table) computes once per
    batch; classifier-free guidance runs cond/uncond as one 2B-batched
    forward (one MXU pass, not two).

Params fp32; activations cfg.dtype; losses/schedule fp32.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .transformer import _init_linear
from .vision import ViTConfig, patchify


@dataclass(frozen=True)
class DiTConfig:
    image_size: int = 32
    patch_size: int = 4
    channels: int = 3
    d_model: int = 256
    n_heads: int = 4
    n_layers: int = 4
    d_ff: int = 1024
    n_classes: int = 10
    timesteps: int = 1000
    dtype: str = "bfloat16"

    @property
    def n_patches(self) -> int:
        assert self.image_size % self.patch_size == 0
        return (self.image_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return self.patch_size**2 * self.channels

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def null_class(self) -> int:
        return self.n_classes  # the CFG "unconditional" row

    @property
    def act_dtype(self):
        return jnp.dtype(self.dtype)

    def vit(self) -> ViTConfig:
        """The patchify-compatible shape view."""
        return ViTConfig(image_size=self.image_size,
                         patch_size=self.patch_size, channels=self.channels,
                         d_model=self.d_model, n_heads=self.n_heads,
                         n_layers=self.n_layers, d_ff=self.d_ff,
                         dtype=self.dtype)


def init_dit_params(key, cfg: DiTConfig):
    keys = jax.random.split(key, cfg.n_layers + 4)
    d = cfg.d_model
    params = {
        "patch_proj": _init_linear(keys[0], cfg.patch_dim, d),
        "pos_embed": jax.random.normal(
            keys[1], (cfg.n_patches, d), jnp.float32) * 0.02,
        # timestep MLP over the sinusoid; class table has a null row for CFG
        "t_mlp1": _init_linear(keys[2], 256, d),
        "t_mlp1_b": jnp.zeros((d,), jnp.float32),
        "t_mlp2": _init_linear(jax.random.fold_in(keys[2], 1), d, d),
        "t_mlp2_b": jnp.zeros((d,), jnp.float32),
        "y_embed": jax.random.normal(
            keys[3], (cfg.n_classes + 1, d), jnp.float32) * 0.02,
        # adaLN-Zero final layer: modulation AND output projection zero-init
        "final_ada": jnp.zeros((d, 2 * d), jnp.float32),
        "final_ada_b": jnp.zeros((2 * d,), jnp.float32),
        "final_proj": jnp.zeros((d, cfg.patch_dim), jnp.float32),
        "final_proj_b": jnp.zeros((cfg.patch_dim,), jnp.float32),
        "blocks": [],
    }
    for i in range(cfg.n_layers):
        k = jax.random.split(keys[4 + i], 5)
        params["blocks"].append({
            "wqkv": _init_linear(k[0], d, 3 * d),
            "wo": _init_linear(k[1], d, d),
            "w_fc": _init_linear(k[2], d, cfg.d_ff),
            "w_proj": _init_linear(k[3], cfg.d_ff, d),
            # adaLN-Zero: zero modulation => gates 0 => identity block
            "ada": jnp.zeros((d, 6 * d), jnp.float32),
            "ada_b": jnp.zeros((6 * d,), jnp.float32),
        })
    return params


def timestep_embedding(t, dim: int = 256, max_period: float = 10000.0):
    """(B,) int/float timesteps -> (B, dim) fp32 sinusoids (DDPM/DiT)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _modulate(x, shift, scale):
    # LayerNorm without learnable affine (the DiT convention): the adaLN
    # shift/scale ARE the affine, conditioned on (t, y)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    return (h * (1.0 + scale[:, None]) + shift[:, None]).astype(x.dtype)


def _mm(y, w):
    return jnp.dot(y, w.astype(y.dtype), preferred_element_type=jnp.float32)


def _dit_block(x, c, p, cfg: DiTConfig):
    """x (B, N, d), c (B, d) fp32 conditioning -> (B, N, d)."""
    b, n, d = x.shape
    h, hd = cfg.n_heads, cfg.head_dim
    mods = jnp.dot(jax.nn.silu(c), p["ada"]) + p["ada_b"]  # fp32 (B, 6d)
    s1, sc1, g1, s2, sc2, g2 = jnp.split(mods, 6, axis=-1)

    y = _modulate(x, s1, sc1)
    qkv = _mm(y, p["wqkv"]).astype(y.dtype).reshape(b, n, 3, h, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * (1.0 / math.sqrt(hd))
    prob = jax.nn.softmax(sc, axis=-1)
    attn = jnp.einsum("bhqk,bhkd->bhqd", prob,
                      v.astype(jnp.float32)).astype(x.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
    x = x + (g1[:, None] * _mm(attn, p["wo"])).astype(x.dtype)

    y = _modulate(x, s2, sc2)
    act = jax.nn.gelu(_mm(y, p["w_fc"]), approximate=True).astype(y.dtype)
    x = x + (g2[:, None] * _mm(act, p["w_proj"])).astype(x.dtype)
    return x


def unpatchify(x, cfg: DiTConfig):
    """(B, N, patch_dim) -> (B, H, W, C): inverse of vision.patchify."""
    b = x.shape[0]
    p, c = cfg.patch_size, cfg.channels
    g = cfg.image_size // p
    x = x.reshape(b, g, g, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, cfg.image_size, cfg.image_size, c)


def dit_forward(params, images, t, y, cfg: DiTConfig):
    """Predict epsilon: images (B, H, W, C), t (B,) int32 timesteps,
    y (B,) int32 class labels (null_class = unconditional) -> (B, H, W, C)
    fp32."""
    x = patchify(images, cfg.vit()).astype(cfg.act_dtype)
    x = _mm(x, params["patch_proj"]).astype(cfg.act_dtype)
    x = x + params["pos_embed"].astype(x.dtype)
    temb = timestep_embedding(t)
    temb = jnp.dot(jax.nn.silu(
        jnp.dot(temb, params["t_mlp1"]) + params["t_mlp1_b"]),
        params["t_mlp2"]) + params["t_mlp2_b"]
    c = temb + params["y_embed"][y]  # (B, d) fp32
    for p in params["blocks"]:
        x = _dit_block(x, c, p, cfg)
    mods = jnp.dot(jax.nn.silu(c), params["final_ada"]) + params["final_ada_b"]
    shift, scale = jnp.split(mods, 2, axis=-1)
    x = _modulate(x, shift, scale)
    out = _mm(x, params["final_proj"]) + params["final_proj_b"]  # fp32
    return unpatchify(out, cfg)


# ---------------------------------------------------------------------------
# diffusion schedule / training
# ---------------------------------------------------------------------------


def alphas_bar(cfg: DiTConfig):
    """DDPM linear-beta schedule's cumulative alpha, (T,) fp32.

    The canonical (1e-4, 0.02) endpoints are calibrated for T=1000; for
    other T they are scaled by 1000/T (the diffusers convention) so the
    TERMINAL SNR stays near zero — otherwise short schedules leave
    ~sqrt(ab_T) signal at t=T-1 and sampling from pure noise starts
    out-of-distribution (observed as class-unconditional samples in
    examples/generate_dit.py before the fix)."""
    scale = 1000.0 / cfg.timesteps
    betas = jnp.linspace(scale * 1e-4, scale * 0.02, cfg.timesteps,
                         dtype=jnp.float32)
    return jnp.cumprod(1.0 - betas)


def q_sample(x0, t, noise, ab):
    """Forward process: x_t = sqrt(ab_t) x0 + sqrt(1-ab_t) eps."""
    a = ab[t][:, None, None, None]
    return jnp.sqrt(a) * x0.astype(jnp.float32) + jnp.sqrt(1.0 - a) * noise


def dit_loss(params, key, images, labels, cfg: DiTConfig,
             drop_prob: float = 0.1):
    """Epsilon-prediction MSE at uniformly sampled t; labels drop to the
    null class with drop_prob (trains the CFG unconditional branch)."""
    b = images.shape[0]
    kt, kn, kd = jax.random.split(key, 3)
    t = jax.random.randint(kt, (b,), 0, cfg.timesteps, jnp.int32)
    noise = jax.random.normal(kn, images.shape, jnp.float32)
    xt = q_sample(images, t, noise, alphas_bar(cfg))
    y = jnp.where(jax.random.uniform(kd, (b,)) < drop_prob,
                  jnp.int32(cfg.null_class), labels.astype(jnp.int32))
    pred = dit_forward(params, xt.astype(cfg.act_dtype), t, y, cfg)
    return jnp.mean(jnp.square(pred - noise))


def make_dit_train_step(cfg: DiTConfig, oc=None, drop_prob: float = 0.1):
    from .train import OptConfig, apply_update

    oc = oc or OptConfig(lr=1e-3, weight_decay=0.0)

    def step(params, opt_state, key, images, labels):
        loss, grads = jax.value_and_grad(dit_loss)(
            params, key, images, labels, cfg, drop_prob)
        params, opt_state = apply_update(params, grads, opt_state, oc)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# DDIM sampling (classifier-free guidance)
# ---------------------------------------------------------------------------


def ddim_sample(params, key, labels, cfg: DiTConfig, steps: int = 50,
                guidance: float = 1.0, eta: float = 0.0):
    """DDIM sampling from pure noise, ONE compiled program.  labels (B,)
    int32; guidance > 1 enables CFG (cond/uncond run as one 2B-batched
    forward).  eta interpolates deterministic DDIM (0, default) to
    ancestral DDPM-like stochastic sampling (1): per-step noise of scale
    sigma_t = eta * sqrt((1-ab_prev)/(1-ab_t)) * sqrt(1-ab_t/ab_prev)
    (Song et al. 2021 eq. 16).  Returns (B, H, W, C) fp32."""
    b = labels.shape[0]
    shape = (b, cfg.image_size, cfg.image_size, cfg.channels)
    # static step subset T-1 -> 0 (evenly spaced), ab gathered by index
    ts = jnp.linspace(cfg.timesteps - 1, 0, steps).round().astype(jnp.int32)
    ab = alphas_bar(cfg)

    @jax.jit
    def run(params, key, labels):
        key, knoise = jax.random.split(key)
        x = jax.random.normal(knoise, shape, jnp.float32)

        def eps_fn(x, t):
            tb = jnp.full((b,), t, jnp.int32)
            if guidance == 1.0:
                return dit_forward(params, x.astype(cfg.act_dtype), tb,
                                   labels, cfg)
            x2 = jnp.concatenate([x, x]).astype(cfg.act_dtype)
            t2 = jnp.concatenate([tb, tb])
            y2 = jnp.concatenate(
                [labels, jnp.full((b,), cfg.null_class, jnp.int32)])
            e = dit_forward(params, x2, t2, y2, cfg)
            cond, uncond = e[:b], e[b:]
            return uncond + guidance * (cond - uncond)

        def step(x, i):
            t = ts[i]
            ab_t = ab[t]
            # the step after the last denoises fully: ab_prev = 1
            ab_prev = jnp.where(i + 1 < steps, ab[ts[jnp.minimum(
                i + 1, steps - 1)]], jnp.float32(1.0))
            eps = eps_fn(x, t)
            x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
            x0 = jnp.clip(x0, -1.5, 1.5)
            if eta == 0.0:
                x = jnp.sqrt(ab_prev) * x0 + jnp.sqrt(1.0 - ab_prev) * eps
            else:
                sigma = (eta
                         * jnp.sqrt((1.0 - ab_prev) / (1.0 - ab_t))
                         * jnp.sqrt(1.0 - ab_t / ab_prev))
                z = jax.random.normal(jax.random.fold_in(key, i), shape,
                                      jnp.float32)
                x = (jnp.sqrt(ab_prev) * x0
                     + jnp.sqrt(jnp.maximum(1.0 - ab_prev - sigma**2, 0.0))
                     * eps + sigma * z)
            return x, None

        x, _ = jax.lax.scan(step, x, jnp.arange(steps))
        return x

    return run(params, key, labels)
