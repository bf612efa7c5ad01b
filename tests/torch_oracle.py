"""Independent plain-torch mirror of the diffusers UNet2DConditionModel /
AutoencoderKL forward passes.

Purpose: a FULL-MODEL differential oracle for the HF->flax weight mapping
(``models/hf_loading.py``) that shares **no code** with the thing it checks.
The module tree is built so ``state_dict()`` keys match the diffusers
checkpoint layout exactly (the layout the reference's ckpt converter encodes
in its mapping tables, /root/reference/lora_diffusion/to_ckpt_v2.py:16-185,
and that reference trainers load via ``from_pretrained``,
cli_lora_pti.py:109-126).  Forward semantics re-implement the
SD-era diffusers modules from their definitions: ResnetBlock2D,
Transformer2DModel (conv or linear projections), BasicTransformerBlock
(pre-LN, GEGLU), Downsample2D/Upsample2D, and the VAE encoder/decoder with
the old-style single-head AttentionBlock and the asymmetric (0,1,0,1)
encoder downsample padding.

Only torch + stdlib; no diffusers, no jax.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


def get_timestep_embedding(timesteps, dim, flip_sin_to_cos=True, freq_shift=0):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - freq_shift)
    freqs = torch.exp(exponent)
    args = timesteps.float()[:, None] * freqs[None, :]
    sin, cos = torch.sin(args), torch.cos(args)
    emb = torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)
    if dim % 2 == 1:
        emb = F.pad(emb, (0, 1))
    return emb


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (silu nonlinearity, optional temb)."""

    def __init__(self, in_ch, out_ch, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class CrossAttention(nn.Module):
    def __init__(self, query_dim, context_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(query_dim, query_dim, bias=False)
        self.to_k = nn.Linear(context_dim, query_dim, bias=False)
        self.to_v = nn.Linear(context_dim, query_dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(query_dim, query_dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b, sq, c = q.shape
        h = self.heads
        d = c // h
        q = q.view(b, sq, h, d).transpose(1, 2)
        k = k.view(b, -1, h, d).transpose(1, 2)
        v = v.view(b, -1, h, d).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) * (d ** -0.5), dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, sq, c)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Identity(),
                                  nn.Linear(inner, dim)])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads):
        super().__init__()
        self.attn1 = CrossAttention(dim, dim, heads)
        self.attn2 = CrossAttention(dim, context_dim, heads)
        self.ff = FeedForward(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        x = self.ff(self.norm3(x)) + x
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, dim, context_dim, heads, groups=32,
                 use_linear_projection=False):
        super().__init__()
        self.use_linear_projection = use_linear_projection
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        if use_linear_projection:
            self.proj_in = nn.Linear(dim, dim)
            self.proj_out = nn.Linear(dim, dim)
        else:
            self.proj_in = nn.Conv2d(dim, dim, 1)
            self.proj_out = nn.Conv2d(dim, dim, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, context_dim, heads)]
        )

    def forward(self, x, context):
        b, c, hh, ww = x.shape
        residual = x
        h = self.norm(x)
        if self.use_linear_projection:
            h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h)
            h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = self.transformer_blocks[0](h, context)
        if self.use_linear_projection:
            h = self.proj_out(h)
            h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        else:
            h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
            h = self.proj_out(h)
        return h + residual


class Downsample2D(nn.Module):
    """UNet downsample: stride-2 conv, symmetric padding 1."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class VAEDownsample(nn.Module):
    """VAE encoder downsample: asymmetric (0,1,0,1) pad, stride-2 conv."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class _DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, temb_dim, groups, context_dim,
                 heads, cross, use_linear, add_down):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, temb_dim, groups)
            for j in range(layers)
        ])
        if cross:
            self.attentions = nn.ModuleList([
                Transformer2DModel(out_ch, context_dim, heads, groups, use_linear)
                for _ in range(layers)
            ])
        else:
            self.attentions = None
        if add_down:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch)])
        else:
            self.downsamplers = None


class _UpBlock(nn.Module):
    def __init__(self, in_chs, out_ch, temb_dim, groups, context_dim, heads,
                 cross, use_linear, add_up):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(cin, out_ch, temb_dim, groups) for cin in in_chs
        ])
        if cross:
            self.attentions = nn.ModuleList([
                Transformer2DModel(out_ch, context_dim, heads, groups, use_linear)
                for _ in in_chs
            ])
        else:
            self.attentions = None
        if add_up:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])
        else:
            self.upsamplers = None


class _MidBlock(nn.Module):
    def __init__(self, ch, temb_dim, groups, context_dim, heads, use_linear):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(ch, ch, temb_dim, groups),
            ResnetBlock2D(ch, ch, temb_dim, groups),
        ])
        self.attentions = nn.ModuleList([
            Transformer2DModel(ch, context_dim, heads, groups, use_linear)
        ])


class TorchUNet(nn.Module):
    """diffusers UNet2DConditionModel mirror (SD 1.x / 2.x topology).

    ``config`` is the framework's ``UNetConfig`` dataclass (used for shapes
    only — no framework code runs here).
    """

    def __init__(self, config):
        super().__init__()
        cfg = self.cfg = config
        chans = list(cfg.block_out_channels)
        temb_dim = chans[0] * 4
        g = cfg.norm_num_groups

        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(chans[0], temb_dim)

        def heads(i):
            if isinstance(cfg.attention_head_dim, (tuple, list)):
                return int(cfg.attention_head_dim[i])
            return int(cfg.attention_head_dim)

        self.down_blocks = nn.ModuleList()
        down_out_chs = [chans[0]]  # conv_in output
        prev = chans[0]
        for i, btype in enumerate(cfg.down_block_types):
            ch = chans[i]
            self.down_blocks.append(_DownBlock(
                prev, ch, cfg.layers_per_block, temb_dim, g,
                cfg.cross_attention_dim, heads(i),
                btype == "CrossAttnDownBlock2D", cfg.use_linear_projection,
                add_down=i < len(chans) - 1,
            ))
            down_out_chs += [ch] * cfg.layers_per_block
            if i < len(chans) - 1:
                down_out_chs.append(ch)
            prev = ch

        self.mid_block = _MidBlock(chans[-1], temb_dim, g,
                                   cfg.cross_attention_dim,
                                   heads(len(chans) - 1),
                                   cfg.use_linear_projection)

        rev = list(reversed(chans))
        self.up_blocks = nn.ModuleList()
        skips = list(down_out_chs)
        for i, btype in enumerate(cfg.up_block_types):
            ch = rev[i]
            prev_ch = rev[max(i - 1, 0)]
            in_chs = []
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                in_chs.append((prev_ch if j == 0 else ch) + skip)
            self.up_blocks.append(_UpBlock(
                in_chs, ch, temb_dim, g, cfg.cross_attention_dim,
                heads(len(chans) - 1 - i),
                btype == "CrossAttnUpBlock2D", cfg.use_linear_projection,
                add_up=i < len(chans) - 1,
            ))

        self.conv_norm_out = nn.GroupNorm(g, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, context):
        cfg = self.cfg
        if timesteps.dim() == 0:
            timesteps = timesteps.expand(sample.shape[0])
        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos,
            cfg.freq_shift,
        )
        temb = self.time_embedding(t_emb)

        h = self.conv_in(sample)
        states = [h]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if blk.attentions is not None:
                    h = blk.attentions[j](h, context)
                states.append(h)
            if blk.downsamplers is not None:
                h = blk.downsamplers[0](h)
                states.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)

        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, states.pop()], dim=1)
                h = res(h, temb)
                if blk.attentions is not None:
                    h = blk.attentions[j](h, context)
            if blk.upsamplers is not None:
                h = blk.upsamplers[0](h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


class VAEAttention(nn.Module):
    """Old-style diffusers AttentionBlock: single head over channels."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.query = nn.Linear(ch, ch)
        self.key = nn.Linear(ch, ch)
        self.value = nn.Linear(ch, ch)
        self.proj_attn = nn.Linear(ch, ch)

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q, k, v = self.query(h), self.key(h), self.value(h)
        attn = torch.softmax(q @ k.transpose(-1, -2) * (c ** -0.5), dim=-1)
        h = self.proj_attn(attn @ v)
        return x + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class _VAEResBlock(nn.Module):
    def __init__(self, in_ch, out_ch, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _VAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            _VAEResBlock(ch, ch, groups), _VAEResBlock(ch, ch, groups)
        ])
        self.attentions = nn.ModuleList([VAEAttention(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _VAEDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_down):
        super().__init__()
        self.resnets = nn.ModuleList([
            _VAEResBlock(in_ch if j == 0 else out_ch, out_ch, groups)
            for j in range(layers)
        ])
        if add_down:
            self.downsamplers = nn.ModuleList([VAEDownsample(out_ch)])
        else:
            self.downsamplers = None


class _VAEUpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_up):
        super().__init__()
        self.resnets = nn.ModuleList([
            _VAEResBlock(in_ch if j == 0 else out_ch, out_ch, groups)
            for j in range(layers + 1)
        ])
        if add_up:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])
        else:
            self.upsamplers = None


class _VAEEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = list(cfg.block_out_channels)
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        prev = chans[0]
        for i, ch in enumerate(chans):
            self.down_blocks.append(_VAEDownBlock(
                prev, ch, cfg.layers_per_block, g, add_down=i < len(chans) - 1
            ))
            prev = ch
        self.mid_block = _VAEMid(chans[-1], g)
        self.conv_norm_out = nn.GroupNorm(g, chans[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                x = res(x)
            if blk.downsamplers is not None:
                x = blk.downsamplers[0](x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class _VAEDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = list(reversed(cfg.block_out_channels))
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.latent_channels, chans[0], 3, padding=1)
        self.mid_block = _VAEMid(chans[0], g)
        self.up_blocks = nn.ModuleList()
        prev = chans[0]
        for i, ch in enumerate(chans):
            self.up_blocks.append(_VAEUpBlock(
                prev, ch, cfg.layers_per_block, g, add_up=i < len(chans) - 1
            ))
            prev = ch
        self.conv_norm_out = nn.GroupNorm(g, chans[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[-1], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        x = self.mid_block(self.conv_in(z))
        for blk in self.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if blk.upsamplers is not None:
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TorchVAE(nn.Module):
    """diffusers AutoencoderKL mirror.  ``config`` = framework VAEConfig."""

    def __init__(self, config):
        super().__init__()
        self.encoder = _VAEEncoder(config)
        self.decoder = _VAEDecoder(config)
        self.quant_conv = nn.Conv2d(2 * config.latent_channels,
                                    2 * config.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(config.latent_channels,
                                         config.latent_channels, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


def randomize_(model: nn.Module, seed: int = 0, scale: float = 0.2) -> None:
    """Give every parameter a non-degenerate random value (norm scales get
    mean 1) so layout/transpose bugs cannot hide behind default inits."""
    gen = torch.Generator().manual_seed(seed)
    for name, p in model.named_parameters():
        base = torch.randn(p.shape, generator=gen) * scale
        if name.endswith(".weight") and p.dim() == 1:
            base = base + 1.0  # norm scales
        with torch.no_grad():
            p.copy_(base)
