"""Pallas TPU fused conv kernel for stride-1 3x3 (NHWC, HWIO) convolutions.

Why a kernel: XLA's conv emitter runs the SD UNet's 3x3 convs at 60-70% MXU,
and both matmul reformulations (im2col / shifted-view accumulation,
``models/layers.py``) are HBM-bound — the shifted form re-reads the input and
round-trips the fp32 accumulator through HBM once per tap (9x).  Measured at
b2 64x64x320 on v5e: 266 us/conv (shifted) vs a ~77 us MXU-bound ideal.

This kernel keeps the accumulator in VMEM for all 9 taps:

- Outside the kernel, the padded input is stacked into nine tap views
  ``x9[b, 3*kh+kw] = xp[b, kh:kh+H, kw:kw+W]`` flattened to dense 2D row
  blocks (B, 9, H*W, C).  Each view is a strided memcpy fusion in XLA
  (rows are W*C contiguous bytes) — ~8 extra input copies of HBM traffic,
  which is cheap next to the 9x accumulator round-trips it removes.
- Grid: (batch, H/bh row blocks, O/128 output-channel blocks).  Each step
  runs 9 tile-aligned matmuls ``(bh*W, C) @ (C, 128)`` — one per tap —
  accumulating into an fp32 VMEM scratch.  No in-kernel reshapes or
  slices: a W-shift-in-VMEM variant (only 3 row-shifted views) was
  measured 40% SLOWER than XLA because its (bh, W+2, C) -> (bh*(W+2), C)
  reshape breaks sublane tile alignment and Mosaic relayouts every block.
- Bias is fused into the epilogue.

HBM traffic per conv: x9 once (9x input bytes, written once read once) +
weights + output once — vs ~9x (input + fp32 accumulator) round-trips for
the shifted-matmul form.  FLOPs are identical to the direct conv up to the
O -> 128 round-up (20% at O=320, 0% at 640/1280).

The backward pass is delegated to XLA's conv transpose machinery via
``jax.custom_vjp`` (the reference derivative of an equivalent
``lax.conv_general_dilated``): training gets the fast Pallas forward and
bit-standard gradients.

Reference replaced: torch's cudnn-backed nn.Conv2d inside every UNet/VAE
ResnetBlock (reference models come from diffusers; conv LoRA extension at
lora_diffusion/lora.py:126-161).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 128  # output-channel block = one lane tile


def _cdiv(a, b):
    return -(-a // b)


def _row_block(H, W, C, itemsize=2):
    """Rows per grid step: big enough to feed the MXU (target 512), small
    enough that the double-buffered 9-tap x9 block stays ~<=3MB of VMEM.

    ``itemsize`` matters: the production compute path is bf16 (2 bytes),
    but the fp32 selftest rows double the x9 block — at b2 64x64x320 the
    2-byte sizing puts the fp32 compile 832KB over the 16MB scoped-VMEM
    limit (observed on v5e after a compile-env change; r3 squeaked under).
    Halving the row block for 4-byte dtypes keeps bf16 byte-identical.
    """
    rows_cap = max(64, min(512, 3145728 // (9 * C * itemsize)))
    bh = max(1, min(H, rows_cap // W))
    while bh > 1 and H % bh:  # grid needs bh | H; snap down to a divisor
        bh -= 1
    return bh


def _kernel(x9_ref, w_ref, b_ref, o_ref, acc_ref):
    """One (batch, row-block, cout-block) grid step.

    x9_ref: (1, 9, bh*W, C) tap views, each a dense row-major 2D matrix
    w_ref:  (9, C, bn) tap weights
    b_ref:  (1, bn) bias
    o_ref:  (1, bh*W, bn) output block
    acc_ref: (bh*W, bn) fp32 scratch accumulator

    Everything is 2D and tile-aligned — no in-kernel reshapes or slices
    (an early variant sliced W-shifted windows of a (bh, W+2, C) block in
    VMEM; W+2 breaks sublane alignment and Mosaic relayouts the whole
    block every step, which cost more than the matmuls).
    """
    acc_ref[...] = jnp.broadcast_to(
        b_ref[0].astype(jnp.float32), acc_ref.shape)
    for t in range(9):
        acc_ref[...] += jnp.dot(x9_ref[0, t], w_ref[t],
                                preferred_element_type=jnp.float32)
    o_ref[0] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_fwd(x, kernel, bias, *, interpret=False):
    """x (B,H,W,C), kernel (3,3,C,O), bias (O,) -> (B,H,W,O)."""
    B, H, W, C = x.shape
    _, _, _, O = kernel.shape
    dtype = x.dtype
    bh = _row_block(H, W, C, dtype.itemsize)
    Op = _cdiv(O, BN) * BN
    if Op != O:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, Op - O)))
        bias = jnp.pad(bias, (0, Op - O))

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # nine tap views, one per (kh, kw), flattened to dense 2D row blocks.
    # Each view is a strided slice whose rows are W*C contiguous bytes —
    # a plain strided memcpy fusion in XLA (unlike im2col's lane-dim
    # concat, which is a true relayout).
    x9 = jnp.stack(
        [xp[:, i:i + H, j:j + W] for i in range(3) for j in range(3)],
        axis=1,
    ).reshape(B, 9, H * W, C)
    bias2d = bias.reshape(1, Op).astype(dtype)
    w9 = kernel.astype(dtype).reshape(9, C, Op)

    grid = (B, H // bh, Op // BN)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 9, bh * W, C), lambda b, h, o: (b, 0, h, 0)),
            pl.BlockSpec((9, C, BN), lambda b, h, o: (0, 0, o)),
            pl.BlockSpec((1, BN), lambda b, h, o: (0, o)),
        ],
        out_specs=pl.BlockSpec((1, bh * W, BN), lambda b, h, o: (b, h, o)),
        out_shape=jax.ShapeDtypeStruct((B, H * W, Op), dtype),
        scratch_shapes=[pltpu.VMEM((bh * W, BN), jnp.float32)],
        interpret=interpret,
    )(x9, w9, bias2d)
    out = out.reshape(B, H, W, Op)
    return out[..., :O] if Op != O else out


def _xla_conv(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3(x, kernel, bias, interpret=False):
    """Stride-1 same-padded 3x3 conv, Pallas forward / XLA-derived backward.

    Shapes: x (B,H,W,C) NHWC, kernel (3,3,C,O) HWIO, bias (O,).
    Requires H % min(H,16) == 0 (true for all power-of-two UNet/VAE levels);
    see ``supported()`` for the routing predicate.
    """
    return _conv3x3_fwd(x, kernel, bias, interpret=interpret)


def _fwd(x, kernel, bias, interpret):
    return _conv3x3_fwd(x, kernel, bias, interpret=interpret), (x, kernel)


def _bwd(interpret, res, g):
    x, kernel = res
    # gradients of the mathematically identical XLA conv: correct by
    # construction and uses XLA's tuned transpose-conv emitters
    _, vjp = jax.vjp(lambda xx, kk, bb: _xla_conv(xx, kk, bb),
                     x, kernel, jnp.zeros((kernel.shape[-1],), x.dtype))
    dx, dk, db = vjp(g)
    return dx, dk, db


conv3x3.defvjp(_fwd, _bwd)


def supported(x_shape, kernel_shape, strides, padding: int = 1,
              itemsize: int = 2) -> bool:
    """Routing predicate: shapes this kernel handles efficiently.

    ``padding`` must be 1 (same-padding): :func:`conv3x3` hardcodes the
    (1, 1) halo, so routing a valid-padding conv here would silently
    produce same-padded (wrong-shape) output.
    """
    if padding != 1:
        return False
    if len(x_shape) != 4 or len(kernel_shape) != 4:
        return False
    B, H, W, C = x_shape
    kh, kw, _, O = kernel_shape
    if (kh, kw) != (3, 3) or strides != (1, 1):
        return False
    if H < 8:
        return False
    # MXU-feedable contraction + lane dims; tiny C (e.g. the RGB stem),
    # tiny O (e.g. rank-r LoRA down convs, O -> 128 lane round-up), or
    # tiny W would waste the tile
    if C % 16 != 0 or C < 64 or O < 64 or W < 8:
        return False
    # VMEM budget (double-buffered x9 + weights + fp32 accumulator) at the
    # caller's element size (bf16 on the production path)
    bh = _row_block(H, W, C, itemsize)
    if bh < H and bh * W < 128:
        # the divisor snap can degenerate to bh=1 (e.g. prime H from an
        # odd img2img latent size): many grid steps of <128-row matmuls
        # starve the MXU — leave those shapes on the XLA emitter.  A
        # whole-image block (bh == H, e.g. the 8x8 UNet level's 64 rows)
        # is exempt: one step cannot be tiled better.
        return False
    vmem = (2 * 9 * bh * W * C * itemsize
            + 2 * 9 * C * BN * itemsize
            + bh * W * BN * 4
            + 2 * bh * W * BN * itemsize)
    return vmem <= 12 * 1024 * 1024
