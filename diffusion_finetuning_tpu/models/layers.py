"""Shared Flax building blocks: the LoRA-capable dense layer.

The reference's ``LoraInjectedLinear`` (lora.py:32-50) computes
``linear(x) + scale * lora_up(lora_down(x))`` by swapping module objects.
Here every targetable dense layer is a :class:`LoRADense`: a plain dense
whose forward adds the low-rank path **iff** the ``'lora'`` variable
collection contains an entry at this module's path.  Injection/removal is
pytree surgery on that collection (see diffusion_finetuning_tpu.lora);
``scale`` is an array leaf so alpha sweeps never recompile.

The low-rank path can run through the fused Pallas kernel
(ops.lora_matmul) on TPU; the default XLA path is a pair of matmuls that
XLA fuses into the surrounding computation.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

default_kernel_init = nn.initializers.lecun_normal()

import os as _os

# Matmul formulations for stride-1 square convs (vs XLA's conv emitter):
#   im2col  — materialize the (B*H*W, kh*kw*C) patch tensor, one big matmul
#   shifted — accumulate kh*kw matmuls over lazily shifted views of x (same
#             contraction, no patch tensor, ~2-3x less HBM traffic)
# Measured on v5e (per-shape scan microbench + end-to-end, see PARITY.md conv
# ledger): shifted wins every SD1.5 level at batch <= 2 INCLUDING 64x64 where
# im2col loses badly (266 vs xla 294 vs im2col 430 us/conv at 64^2x320), but
# at batch 8 / 32^2x640 (5.2M input elements) the conv emitter wins — the
# boundary tracks total input volume, not spatial size.  Auto rule: shifted
# on TPU when B*H*W*C <= DFT_CONV_MM_MAX_ELEMS (default 4M elements), conv
# emitter otherwise; always OFF on CPU (keeps golden pins bit-stable).
# Overrides: DFT_CONV_IM2COL=0 forces the conv emitter everywhere, =1 forces
# the matmul form (within the elems bound); DFT_CONV_SHIFTED=0 selects
# im2col as the matmul form (the pre-shifted default, kept for A/B).
_IM2COL_ENV = _os.environ.get("DFT_CONV_IM2COL", "auto")
CONV_IM2COL = None if _IM2COL_ENV == "auto" else bool(int(_IM2COL_ENV))
CONV_MM_MAX_ELEMS = int(_os.environ.get("DFT_CONV_MM_MAX_ELEMS", str(4 * 1024 * 1024)))
CONV_SHIFTED = bool(int(_os.environ.get("DFT_CONV_SHIFTED", "1")))
# Pallas fused conv (ops/conv_pallas.py): opt-in A/B only.  Device-profile
# A/B on v5e (per-conv device time, jax.profiler — the chained-dispatch
# microbench floor had inflated all earlier per-conv numbers ~2x): the
# kernel loses to the shipped routing at every SD shape (64^2x320: 187 vs
# 136 us shifted; 16^2x1280: 163 vs 108; b8 32^2x640: 637 vs 317 XLA) —
# XLA's conv/matmul emitters already run these at 60-85% of roofline, and
# the kernel pays x9 tap-stacking traffic plus per-o-block weight
# re-streaming.  Kept for re-measurement on future hardware.
CONV_PALLAS = bool(int(_os.environ.get("DFT_CONV_PALLAS", "0")))


def _use_matmul_conv() -> bool:
    if CONV_IM2COL is None:
        return jax.default_backend() == "tpu"
    return CONV_IM2COL


def _im2col_conv(x: jnp.ndarray, kernel: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Stride-1 conv as an explicit patches-matmul.  x (B,H,W,C) NHWC,
    kernel (kh,kw,C,O) HWIO, symmetric padding."""
    B, H, W, C = x.shape
    kh, kw, _, O = kernel.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Ho, Wo = H + 2 * pad - kh + 1, W + 2 * pad - kw + 1
    cols = [
        xp[:, i:i + Ho, j:j + Wo, :] for i in range(kh) for j in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (B,Ho,Wo,kh*kw*C)
    out = patches.reshape(B * Ho * Wo, kh * kw * C) @ kernel.reshape(
        kh * kw * C, O
    )
    return out.reshape(B, Ho, Wo, O)


def _shifted_matmul_conv(x: jnp.ndarray, kernel: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Stride-1 conv as kh*kw accumulated matmuls over shifted views of x.
    Same contraction as im2col without materializing the patch tensor: each
    (i, j) tap is a (B*Ho*Wo, C) @ (C, O) matmul whose LHS is a lazy slice of
    the padded input (XLA fuses the slice into the operand load)."""
    B, H, W, C = x.shape
    kh, kw, _, O = kernel.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Ho, Wo = H + 2 * pad - kh + 1, W + 2 * pad - kw + 1
    out = None
    for i in range(kh):
        for j in range(kw):
            xs = xp[:, i:i + Ho, j:j + Wo, :].reshape(B * Ho * Wo, C)
            acc = xs @ kernel[i, j]
            out = acc if out is None else out + acc
    return out.reshape(B, Ho, Wo, O)

# Auto-routing of LoRA layers to the fused Pallas kernel on TPU.  Flip with
# set_fused_lora_auto(); explicit ``use_fused_lora=True/False`` always wins.
# Default False: measured end-to-end on v5e (SD1.5 512^2 50-step txt2img),
# XLA's epilogue fusion of the two-matmul LoRA path beats the Pallas kernel
# (1.26 s/img vs 1.72 s/img) — the kernel's full-K VMEM blocking constrains
# XLA's scheduling more than the saved HBM round-trip gains.
FUSED_LORA_AUTO = False


def set_fused_lora_auto(enabled: bool) -> None:
    global FUSED_LORA_AUTO
    FUSED_LORA_AUTO = enabled


class LoRADense(nn.Module):
    """Dense layer with an optional LoRA low-rank delta.

    Weight convention: ``kernel`` is (in, out) as in Flax; the LoRA leaves
    follow the reference on-disk layout — ``up`` (out, r), ``down`` (r, in)
    (torch nn.Linear layout, lora.py:41-43) — so checkpoints round-trip
    without transposes.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = default_kernel_init
    bias_init: Callable = nn.initializers.zeros
    # None = auto: fused Pallas kernel on TPU when the token count is large
    # enough to tile the MXU; the XLA two-matmul path otherwise.
    use_fused_lora: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        dtype = self.dtype or x.dtype
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features), self.param_dtype
        )
        x = x.astype(dtype)
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        if self.has_variable("lora", "up"):
            up = self.get_variable("lora", "up")
            down = self.get_variable("lora", "down")
            scale = self.get_variable("lora", "scale")

            tokens = 1
            for d in x.shape[:-1]:
                tokens *= d
            fused = self.use_fused_lora
            if fused is None:
                fused = FUSED_LORA_AUTO and jax.default_backend() == "tpu" and tokens >= 256
            if fused:
                from ..ops.lora_matmul import lora_dense

                return lora_dense(x, kernel, bias, up, down, scale)
            # XLA path: x @ down.T @ up.T accumulated in fp32 on the MXU
            y = jnp.dot(x, kernel.astype(dtype))
            if bias is not None:
                y = y + bias.astype(dtype)
            h = jnp.dot(x, jnp.transpose(down).astype(dtype))
            delta = jnp.dot(h, jnp.transpose(up).astype(dtype))
            return y + (scale.astype(dtype) * delta)

        y = jnp.dot(x, kernel.astype(dtype))
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class LoRAConv(nn.Module):
    """Conv layer with an optional low-rank LoRA delta.

    The upstream lineage later added ``LoraInjectedConv2d`` (post-snapshot;
    named in BASELINE.json's north star): the delta is a rank-r pair of
    convs — a kh×kw conv to r channels followed by a 1×1 conv to the output
    channels.  On-disk layout follows torch Conv2d weights: ``up``
    (out, r, 1, 1), ``down`` (r, in, kh, kw).

    Param layout matches ``nn.Conv`` (``kernel`` (kh, kw, in, out) +
    ``bias``), so existing checkpoints and the HF weight mapping are
    unchanged.
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        in_features = x.shape[-1]
        dtype = self.dtype or x.dtype
        kernel = self.param(
            "kernel", default_kernel_init,
            (kh, kw, in_features, self.features), self.param_dtype,
        )
        pad = [(self.padding, self.padding)] * 2
        x = x.astype(dtype)

        def conv(inp, k, strides):
            if CONV_PALLAS and jax.default_backend() == "tpu":
                from ..ops import conv_pallas

                if conv_pallas.supported(inp.shape, k.shape, strides,
                                         padding=self.padding,
                                         itemsize=inp.dtype.itemsize):
                    return conv_pallas.conv3x3(
                        inp, k.astype(dtype),
                        jnp.zeros((k.shape[-1],), dtype))
            if (
                _use_matmul_conv()
                and strides == (1, 1)
                and k.shape[:2] != (1, 1)
                and inp.shape[0] * inp.shape[1] * inp.shape[2] * inp.shape[3]
                <= CONV_MM_MAX_ELEMS
            ):
                if CONV_SHIFTED:
                    return _shifted_matmul_conv(inp, k.astype(dtype), self.padding)
                return _im2col_conv(inp, k.astype(dtype), self.padding)
            return jax.lax.conv_general_dilated(
                inp, k.astype(dtype), window_strides=strides, padding=pad
                if k.shape[:2] != (1, 1) else [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        y = conv(x, kernel, self.strides)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(dtype)

        if self.has_variable("lora", "up"):
            up = self.get_variable("lora", "up")        # (out, r, 1, 1)
            down = self.get_variable("lora", "down")    # (r, in, kh, kw)
            scale = self.get_variable("lora", "scale")
            down_k = jnp.transpose(down, (2, 3, 1, 0))  # (kh, kw, in, r)
            up_k = jnp.transpose(up, (2, 3, 1, 0))      # (1, 1, r, out)
            h = conv(x, down_k, self.strides)
            delta = conv(h, up_k, (1, 1))
            y = y + scale.astype(dtype) * delta
        return y


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * nn.sigmoid(1.702 * x)


ACT2FN = {
    "quick_gelu": quick_gelu,
    # exact erf gelu — torch F.gelu default (flax nn.gelu defaults to the
    # tanh approximation, ~1e-3 off per activation)
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "silu": nn.silu,
    "swish": nn.silu,
    "relu": nn.relu,
    "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
}
