"""Flax UNet2DConditionModel (SD 1.x / 2.x denoiser), TPU-first.

Replaces the reference's ``diffusers.UNet2DConditionModel`` (reference:
cli_lora_pti.py:117-126, train_lora_dreambooth.py:592-594).  Data layout is
NHWC; every attention/GEGLU projection is a
:class:`~diffusion_finetuning_tpu.models.layers.LoRADense`, so the reference
target sets {"CrossAttention","Attention","GEGLU"} (lora.py:53) address them
via module paths, and :func:`unet_lora_targets` enumerates them in the exact
order community safetensors files index pairs (down_blocks -> up_blocks ->
mid_block; attn1, GEGLU, attn2 within a block — fingerprint-verified against
example_loras/lora_disney.safetensors).

Attention routes through ops.attention (Pallas flash attention on TPU, fused
XLA fallback) — the replacement for the reference's xformers shim
(xformers_utils.py:42-70).  Gradient checkpointing wraps attention+resnet
blocks via ``jax.checkpoint`` (reference: unet.enable_gradient_checkpointing,
train_lora_dreambooth.py:627-630).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..lora import LoraTarget
from ..ops.attention import attention as attention_op
from .layers import LoRAConv, LoRADense


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # Per-block head count (SD-era diffusers semantics: ``attention_head_dim``
    # in the HF config is the number of heads; head size = C // heads).
    attention_head_dim: Union[int, Tuple[int, ...]] = 8
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    use_flash_attention: Optional[bool] = None  # None = auto (TPU yes)
    gradient_checkpointing: bool = False

    def heads_for_block(self, i: int) -> int:
        if isinstance(self.attention_head_dim, (tuple, list)):
            return int(self.attention_head_dim[i])
        return int(self.attention_head_dim)

    @staticmethod
    def sd15() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def sd21() -> "UNetConfig":
        return UNetConfig(
            cross_attention_dim=1024,
            attention_head_dim=(5, 10, 20, 20),
            use_linear_projection=True,
        )

    @staticmethod
    def tiny(cross_attention_dim: int = 32) -> "UNetConfig":
        """CPU-fast config with the full block topology."""
        return UNetConfig(
            sample_size=8,
            block_out_channels=(8, 16, 16, 16),
            layers_per_block=1,
            cross_attention_dim=cross_attention_dim,
            attention_head_dim=2,
            norm_num_groups=4,
        )


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0, max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal embeddings (diffusers get_timestep_embedding parity)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(h)


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        # LoRA-capable convs (the upstream LoraInjectedConv2d extension):
        # plain convs unless a `lora` collection entry targets them
        h = LoRAConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                     name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = LoRAConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                     name="conv2")(h)
        if in_channels != self.out_channels:
            x = LoRAConv(self.out_channels, (1, 1), dtype=self.dtype,
                         name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """Multi-head attention with LoRA-capable projections.

    Named ``CrossAttention`` deliberately: the module path ancestor matches
    the reference target-set string (lora.py:53).  Self-attention when
    ``context`` is None.  to_q/to_k/to_v have no bias, to_out does
    (diffusers CrossAttention layout, which checkpoints assume).
    """

    query_dim: int
    heads: int
    use_flash: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        q = LoRADense(self.query_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = LoRADense(self.query_dim, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = LoRADense(self.query_dim, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        out = attention_op(q, k, v, self.heads, use_flash=self.use_flash)
        return LoRADense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LoRADense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu: diffusers GEGLU uses F.gelu, not the tanh approx
        return h * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        x = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    context_dim: int
    use_flash: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = CrossAttention(
            self.dim, self.heads, use_flash=self.use_flash, dtype=self.dtype,
            name="attn1",
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)) + x
        x = CrossAttention(
            self.dim, self.heads,
            use_flash=self.use_flash, dtype=self.dtype, name="attn2",
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context) + x
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        ) + x
        return x


class Transformer2DModel(nn.Module):
    heads: int
    context_dim: int
    groups: int = 32
    use_linear_projection: bool = False
    use_flash: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(B, H * W, C)
            h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
            h = h.reshape(B, H * W, C)
        h = BasicTransformerBlock(
            C, self.heads, self.context_dim, use_flash=self.use_flash,
            dtype=self.dtype, name="transformer_blocks_0",
        )(h, context)
        if self.use_linear_projection:
            h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, C)
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class Downsample2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class UNet2DConditionModel(nn.Module):
    config: UNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,          # (B, H, W, in_channels) NHWC
        timesteps: jnp.ndarray,       # (B,) or scalar
        encoder_hidden_states: jnp.ndarray,  # (B, S, cross_attention_dim)
    ) -> jnp.ndarray:
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(t_emb)

        # Gradient checkpointing (reference: train_lora_dreambooth.py:627-630)
        # — rematerialize resnet/transformer blocks in the backward pass.
        ResnetCls = nn.remat(ResnetBlock2D) if cfg.gradient_checkpointing else ResnetBlock2D
        TransformerCls = (
            nn.remat(Transformer2DModel) if cfg.gradient_checkpointing else Transformer2DModel
        )

        resnet = lambda ch, name: ResnetCls(
            ch, cfg.norm_num_groups, dtype=self.dtype, name=name)
        transformer = lambda heads, name: TransformerCls(
            heads, cfg.cross_attention_dim, cfg.norm_num_groups,
            cfg.use_linear_projection, cfg.use_flash_attention,
            dtype=self.dtype, name=name)

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(sample)

        # ---- down ----
        down_states = [h]
        for i, (btype, ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
            heads = cfg.heads_for_block(i)
            for j in range(cfg.layers_per_block):
                h = resnet(ch, f"down_blocks_{i}_resnets_{j}")(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    h = transformer(heads, f"down_blocks_{i}_attentions_{j}")(
                        h, encoder_hidden_states)
                down_states.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
                down_states.append(h)

        # ---- mid ----
        mid_ch = cfg.block_out_channels[-1]
        mid_heads = cfg.heads_for_block(len(cfg.block_out_channels) - 1)
        h = resnet(mid_ch, "mid_block_resnets_0")(h, temb)
        h = transformer(mid_heads, "mid_block_attentions_0")(h, encoder_hidden_states)
        h = resnet(mid_ch, "mid_block_resnets_1")(h, temb)

        # ---- up ----
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, btype in enumerate(cfg.up_block_types):
            ch = rev_channels[i]
            heads = cfg.heads_for_block(len(cfg.block_out_channels) - 1 - i)
            for j in range(cfg.layers_per_block + 1):
                skip = down_states.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = resnet(ch, f"up_blocks_{i}_resnets_{j}")(h, temb)
                if btype == "CrossAttnUpBlock2D":
                    h = transformer(heads, f"up_blocks_{i}_attentions_{j}")(
                        h, encoder_hidden_states)
            if i < len(cfg.up_block_types) - 1:
                h = Upsample2D(ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0")(h)

        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


def unet_lora_targets(config: UNetConfig) -> list:
    """Canonical LoRA target enumeration for the UNet.

    Order matches torch ``named_modules`` on diffusers' UNet2DConditionModel,
    which is what reference ``_find_modules`` (lora.py:78-114) yields and what
    safetensors pair indices assume: **down_blocks, then up_blocks, then
    mid_block** (ModuleList registration order — fingerprint-verified against
    example_loras/lora_disney.safetensors), with per-transformer-block order
    attn1(to_q,to_k,to_v,to_out), GEGLU proj, attn2(to_q,to_k,to_v,to_out).
    """
    cfg = config
    targets = []

    def add_transformer_block(prefix: Tuple[str, ...], dim: int):
        tb = prefix + ("transformer_blocks_0",)
        ctx = cfg.cross_attention_dim
        inner = dim * 4
        for name in ("to_q", "to_k", "to_v", "to_out"):
            targets.append(LoraTarget(tb + ("attn1", name), dim, dim, "CrossAttention"))
        targets.append(LoraTarget(tb + ("ff", "net_0", "proj"), dim, inner * 2, "GEGLU"))
        for name, (i_f, o_f) in (
            ("to_q", (dim, dim)),
            ("to_k", (ctx, dim)),
            ("to_v", (ctx, dim)),
            ("to_out", (dim, dim)),
        ):
            targets.append(LoraTarget(tb + ("attn2", name), i_f, o_f, "CrossAttention"))

    for i, (btype, ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
        if btype != "CrossAttnDownBlock2D":
            continue
        for j in range(cfg.layers_per_block):
            add_transformer_block((f"down_blocks_{i}_attentions_{j}",), ch)
    rev = list(reversed(cfg.block_out_channels))
    for i, btype in enumerate(cfg.up_block_types):
        if btype != "CrossAttnUpBlock2D":
            continue
        for j in range(cfg.layers_per_block + 1):
            add_transformer_block((f"up_blocks_{i}_attentions_{j}",), rev[i])
    add_transformer_block(("mid_block_attentions_0",), cfg.block_out_channels[-1])
    return targets


def _resnet_channel_map(cfg: UNetConfig):
    """(path_prefix, in_channels, out_channels) for every ResnetBlock2D, in
    down_blocks -> up_blocks -> mid_block order (matching the linear-target
    enumeration convention)."""
    out = []
    chans = list(cfg.block_out_channels)
    prev = chans[0]
    for i, ch in enumerate(chans):
        for j in range(cfg.layers_per_block):
            cin = prev if j == 0 else ch
            out.append((f"down_blocks_{i}_resnets_{j}", cin, ch))
        prev = ch

    # up blocks consume skip connections: in = out_ch + skip_ch
    rev = list(reversed(chans))
    # skip channels popped in reverse of how down path pushed them
    down_outs = [chans[0]]  # conv_in output
    for i, ch in enumerate(chans):
        for j in range(cfg.layers_per_block):
            down_outs.append(ch)
        if i < len(chans) - 1:
            down_outs.append(ch)  # downsampler
    for i in range(len(rev)):
        ch = rev[i]
        prev_ch = rev[max(i - 1, 0)]
        for j in range(cfg.layers_per_block + 1):
            skip = down_outs.pop()
            cin = (prev_ch if j == 0 else ch) + skip
            out.append((f"up_blocks_{i}_resnets_{j}", cin, ch))

    mid = chans[-1]
    out.append(("mid_block_resnets_0", mid, mid))
    out.append(("mid_block_resnets_1", mid, mid))
    return out


def unet_conv_lora_targets(config: UNetConfig) -> list:
    """Conv2d LoRA targets (the LoraInjectedConv2d extension): conv1/conv2
    (3x3) and conv_shortcut (1x1, when present) of every ResnetBlock2D,
    ancestor name "ResnetBlock2D".  Appended after the linear targets in the
    combined enumeration (no reference golden ordering exists for convs —
    the feature postdates the snapshot)."""
    targets = []
    for prefix, cin, cout in _resnet_channel_map(config):
        targets.append(LoraTarget((prefix, "conv1"), cin, cout,
                                  "ResnetBlock2D", kernel_size=(3, 3)))
        targets.append(LoraTarget((prefix, "conv2"), cout, cout,
                                  "ResnetBlock2D", kernel_size=(3, 3)))
        if cin != cout:
            targets.append(LoraTarget((prefix, "conv_shortcut"), cin, cout,
                                      "ResnetBlock2D", kernel_size=(1, 1)))
    return targets


def unet_all_lora_targets(config: UNetConfig) -> list:
    """Linear targets (canonical order) + conv extension targets."""
    return unet_lora_targets(config) + unet_conv_lora_targets(config)
