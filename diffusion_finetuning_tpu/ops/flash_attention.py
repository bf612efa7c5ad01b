"""Pallas TPU flash attention (forward + custom-VJP backward).

The TPU-native replacement for xformers memory-efficient attention
(reference: lora_diffusion/xformers_utils.py:42-70 enables it on every UNet
BasicTransformerBlock).  Never materializes the (B,H,S,S) score matrix in
HBM: per (batch*head, q-block) grid step, K/V stream through VMEM in blocks
with an online-softmax accumulator; fp32 accumulation on the MXU.

Head dims (SD1.5: 40/80/160) are zero-padded to the 128-lane width before the
kernel; zero columns contribute nothing to logits or outputs.  KV padding
rows are masked with -inf so cross-attention (S_kv=77) is exact.

Backward follows the FlashAttention-2 recipe: recompute P per block from the
saved logsumexp, accumulate dK/dV across q-blocks in VMEM (their output
blocks are indexed by batch*head only, so Pallas keeps them resident across
the q-block grid dimension).

All row-statistics (m, l, lse, delta) are kept 2D/3D — TPU vector layouts
want >=2D shapes with a 128-divisible (or full-array) trailing dim.

Known limit: K/V (and the fp32 dK/dV accumulators in backward) use
whole-sequence BlockSpecs resident in VMEM, which caps the usable KV length
(~8k at head dim 128 for the backward on a 16MB-VMEM core).  SD workloads
top out at S=4096; streaming KV via manual DMA would lift the cap.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# measured on v5e end-to-end (SD1.5 512^2 50-step txt2img): 512/1024 beats
# 256/512 by ~5% (1.21 s vs 1.27 s per image); env knobs for re-tuning on
# new hardware without code edits
import os as _os

DEFAULT_Q_BLOCK = int(_os.environ.get("DFT_FLASH_BLOCK_Q", 512))
DEFAULT_KV_BLOCK = int(_os.environ.get("DFT_FLASH_BLOCK_KV", 1024))
# Unroll the (static-length) KV loop up to this many iterations so Mosaic can
# interleave the VPU softmax of block i with the MXU dots of block i+1;
# fori_loop serializes them on the carried accumulator.
DEFAULT_KV_UNROLL = int(_os.environ.get("DFT_FLASH_KV_UNROLL", 0))
NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len, block_kv,
                unroll=0):
    # Dots run in the INPUT dtype with fp32 accumulation (bf16 inputs hit the
    # MXU at full rate; upcasting first would force 4-8x slower fp32 passes).
    q = q_ref[0]  # (Bq, Dp)
    bq, dp = q.shape
    skv_padded = k_ref.shape[1]
    num_kv = skv_padded // block_kv
    # KV-padding mask is only needed when padding exists (cross-attention);
    # self-attention sequences tile exactly and skip the per-element VPU work
    masked = kv_len != skv_padded

    def body(i, carry):
        acc, m_i, l_i = carry  # (Bq,Dp), (Bq,1), (Bq,1)
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bq, block_kv) fp32
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1) + i * block_kv
            s = jnp.where(col < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, dp), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    if 0 < num_kv <= unroll:
        carry = (acc0, m0, l0)
        for i in range(num_kv):
            carry = body(i, carry)
        acc, m_f, l_f = carry
    else:
        acc, m_f, l_f = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))

    o_ref[0] = (acc / l_f).astype(o_ref.dtype)
    lse_ref[0] = (m_f + jnp.log(l_f)).reshape(1, bq)


def _fwd(q, k, v, scale, kv_len, block_q, block_kv, interpret, unroll=0):
    """q: (BH, Sq, Dp); k/v: (BH, Skv_p, Dp). Returns (out, lse (BH,1,Sq))."""
    bh, sq, dp = q.shape
    skv = k.shape[1]
    grid = (bh, sq // block_q)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_len=kv_len, block_kv=block_kv,
        unroll=unroll,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, skv, dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, skv, dp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * skv * dp,
            bytes_accessed=2 * bh * (sq + 2 * skv) * dp * q.dtype.itemsize,
            transcendentals=bh * sq * skv,
        ),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, *, scale, kv_len, block_kv,
):
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]
    do = do_ref[0]
    bq, dp = q.shape
    lse = lse_ref[0].reshape(bq, 1)
    delta = delta_ref[0].reshape(bq, 1)
    skv_padded = k_ref.shape[1]
    num_kv = skv_padded // block_kv
    masked = kv_len != skv_padded

    dq = jnp.zeros((bq, dp), jnp.float32)

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1) + i * block_kv
            s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)  # (Bq, Bk) fp32
        p_lo = p.astype(v.dtype)

        dv_blk = jax.lax.dot_general(
            p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bk, Dp)
        dv_ref[0, pl.ds(i * block_kv, block_kv), :] += dv_blk.astype(dv_ref.dtype)

        dp_ = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bq, Bk)
        ds = (p * (dp_ - delta) * scale).astype(q.dtype)

        dk_blk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bk, Dp)
        dk_ref[0, pl.ds(i * block_kv, block_kv), :] += dk_blk.astype(dk_ref.dtype)

        dq = dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dq

    dq = jax.lax.fori_loop(0, num_kv, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd(q, k, v, out, lse, do, scale, kv_len, block_q, block_kv, interpret):
    bh, sq, dp = q.shape
    skv = k.shape[1]
    grid = (bh, sq // block_q)

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta.reshape(bh, 1, sq)

    kernel = functools.partial(
        _bwd_kernel, scale=scale, kv_len=kv_len, block_kv=block_kv
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, skv, dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, skv, dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, skv, dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, skv, dp), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, skv, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, skv, dp), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * sq * skv * dp,
            bytes_accessed=4 * bh * (sq + 2 * skv) * dp * q.dtype.itemsize,
            transcendentals=bh * sq * skv,
        ),
    )(q, k, v, do, lse, delta)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# Public entry with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash(q, k, v, scale, kv_len, block_q, block_kv, interpret, unroll=0):
    out, _ = _fwd(q, k, v, scale, kv_len, block_q, block_kv, interpret, unroll)
    return out


def _flash_fwd(q, k, v, scale, kv_len, block_q, block_kv, interpret, unroll=0):
    out, lse = _fwd(q, k, v, scale, kv_len, block_q, block_kv, interpret, unroll)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, kv_len, block_q, block_kv, interpret, unroll, res, do):
    q, k, v, out, lse = res
    dq, dk, dv = _bwd(q, k, v, out, lse, do, scale, kv_len, block_q, block_kv, interpret)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_Q_BLOCK,
    block_kv: int = DEFAULT_KV_BLOCK,
    interpret: bool = False,
    unroll: Optional[int] = None,
) -> jnp.ndarray:
    """(B, Sq, H*D) x (B, Skv, H*D) -> (B, Sq, H*D), differentiable."""
    B, sq, C = q.shape
    skv = k.shape[1]
    head_dim = C // heads
    if scale is None:
        scale = head_dim**-0.5

    dp = _round_up(head_dim, 128)
    # pad q seq to a block multiple; kv to a kv-block multiple
    bq = min(block_q, _round_up(sq, 128))
    sq_p = _round_up(sq, bq)
    bkv = min(block_kv, _round_up(skv, 128))
    skv_p = _round_up(skv, bkv)

    def split_pad(t, s, s_p):
        bt = t.reshape(B, s, heads, head_dim).transpose(0, 2, 1, 3)
        bt = bt.reshape(B * heads, s, head_dim)
        return jnp.pad(bt, ((0, 0), (0, s_p - s), (0, dp - head_dim)))

    qp = split_pad(q, sq, sq_p)
    kp = split_pad(k, skv, skv_p)
    vp = split_pad(v, skv, skv_p)

    if unroll is None:
        unroll = DEFAULT_KV_UNROLL
    out = _flash(qp, kp, vp, float(scale), skv, bq, bkv, interpret, int(unroll))
    out = out[:, :sq, :head_dim].reshape(B, heads, sq, head_dim)
    return out.transpose(0, 2, 1, 3).reshape(B, sq, C)
