"""Flax AutoencoderKL (the SD VAE).

Replaces the reference's ``diffusers.AutoencoderKL`` dependency (reference:
cli_lora_pti.py:109-126, train_lora_dreambooth.py:586-590).  Layout is NHWC
(TPU-native); HF checkpoints (NCHW convs) are transposed on load
(models/hf_loading.py).

Training only uses ``encode(x).sample() * 0.18215`` (reference loss_step,
cli_lora_pti.py:181-184); inference uses ``decode(latents / 0.18215)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

SCALING_FACTOR = 0.18215  # SD latent scaling (reference cli_lora_pti.py:184)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    sample_size: int = 512

    @staticmethod
    def sd15() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                         norm_num_groups=4, sample_size=32)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head VAE mid-block attention (diffusers AttentionBlock)."""

    groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="query")(h)
        k = nn.Dense(C, dtype=self.dtype, name="key")(h)
        v = nn.Dense(C, dtype=self.dtype, name="value")(h)
        scale = C**-0.5
        attn = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * scale, axis=-1).astype(self.dtype)
        h = jnp.einsum("bqk,bkc->bqc", attn, v)
        h = nn.Dense(C, dtype=self.dtype, name="proj_attn")(h)
        return x + h.reshape(B, H, W, C)


class Downsample(nn.Module):
    """VAE encoder downsample: asymmetric (0,1,0,1) pad + stride-2 conv."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class MidBlock(nn.Module):
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        x = ResnetBlock(ch, self.groups, dtype=self.dtype, name="resnets_0")(x)
        x = AttnBlock(self.groups, dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock(ch, self.groups, dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, g, dtype=self.dtype,
                                name=f"down_blocks_{i}_resnets_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                x = Downsample(ch, dtype=self.dtype,
                               name=f"down_blocks_{i}_downsamplers_0")(x)
        x = MidBlock(g, dtype=self.dtype, name="mid_block")(x)
        x = nn.GroupNorm(g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        chans = list(reversed(cfg.block_out_channels))
        x = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = MidBlock(g, dtype=self.dtype, name="mid_block")(x)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(ch, g, dtype=self.dtype,
                                name=f"up_blocks_{i}_resnets_{j}")(x)
            if i < len(chans) - 1:
                x = Upsample(ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0")(x)
        x = nn.GroupNorm(g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)


class DiagonalGaussian:
    """mean/logvar posterior; matches diffusers DiagonalGaussianDistribution."""

    def __init__(self, moments: jnp.ndarray):
        self.mean, logvar = jnp.split(moments, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def _tree_flatten(self):
        return (self.mean, self.logvar, self.std), None

    @classmethod
    def _tree_unflatten(cls, _aux, leaves):
        obj = cls.__new__(cls)
        obj.mean, obj.logvar, obj.std = leaves
        return obj


# Registered as a pytree so `vae.encode` can be returned from jitted
# functions (e.g. a jitted encode-only step) and carried through scans.
jax.tree_util.register_pytree_node(
    DiagonalGaussian,
    DiagonalGaussian._tree_flatten,
    DiagonalGaussian._tree_unflatten,
)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        """x: (B,H,W,3) in [-1,1] -> posterior over (B,H/8,W/8,4) latents."""
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian(moments)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        return self.decode(self.encode(x).sample(rng))
