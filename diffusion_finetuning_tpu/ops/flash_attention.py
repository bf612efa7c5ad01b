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
# fori_loop serializes them on the carried accumulator.  Measured on v5e:
# unrolling the dominant S=4096/d=40 self-attention is worth ~90 ms/image
# (439 -> 350 ms attention time) and ~76 ms end-to-end.
DEFAULT_KV_UNROLL = int(_os.environ.get("DFT_FLASH_KV_UNROLL", 8))
# Base-2 online softmax: fold log2(e) into the logit scale and use exp2 on the
# VPU (its native transcendental) instead of exp — saves one multiply per
# score element in the hot softmax.  Statistics (m, l, lse) live in the
# base-2 domain; forward output is identical up to fp rounding (~4 ms/image
# measured at S=4096).
DEFAULT_EXP2 = bool(int(_os.environ.get("DFT_FLASH_EXP2", 1)))
# Granularity the head dim is zero-padded to OUTSIDE the kernel.  128 pads to
# the full lane width in HBM (3.2x the q/k/v bytes at SD1.5's d=40); 8 keeps
# HBM arrays dense and lets Mosaic mask the partial lane tile in VMEM.
# Measured on v5e, S=4096/d=40 x5/step: dense is 22% faster (338 vs 433
# ms/image of attention) — the padded layout burns HBM bandwidth on zeros.
DEFAULT_HEAD_PAD = int(_os.environ.get("DFT_FLASH_HEAD_PAD", 8))
# Heads per program (forward kernel).  The d=40 lane-padding tax itself is
# NOT removable by packing — per-head contractions of width 40 only pack
# densely by mixing heads, and a block-diagonal layout has byte-for-byte the
# same padded-MXU cost as separate dots — but G>1 amortizes per-program
# overhead (grid shrinks by G) and hands Mosaic G independent dot/softmax
# chains to interleave on top of the KV unroll.  1 = off (the measured r3
# kernel); requires (batch*heads) % G == 0, else silently falls back to 1.
DEFAULT_HEAD_PACK = int(_os.environ.get("DFT_FLASH_HEAD_PACK", 1))
LOG2E = 1.4426950408889634
NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len, block_kv,
                unroll=0, exp2=False):
    # Dots run in the INPUT dtype with fp32 accumulation (bf16 inputs hit the
    # MXU at full rate; upcasting first would force 4-8x slower fp32 passes).
    q = q_ref[0]  # (Bq, Dp)
    bq, dp = q.shape
    skv_padded = k_ref.shape[1]
    num_kv = skv_padded // block_kv
    # KV-padding mask is only needed when padding exists (cross-attention);
    # self-attention sequences tile exactly and skip the per-element VPU work
    masked = kv_len != skv_padded
    # base-2 softmax: logits pre-scaled by log2(e), exp2 on the VPU
    exp_fn = jnp.exp2 if exp2 else jnp.exp
    logit_scale = scale * LOG2E if exp2 else scale

    def body(i, carry):
        acc, m_i, l_i = carry  # (Bq,Dp), (Bq,1), (Bq,1)
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * logit_scale  # (Bq, block_kv) fp32
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1) + i * block_kv
            s = jnp.where(col < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        alpha = exp_fn(m_i - m_new)
        p = exp_fn(s - m_new)
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
    # lse stays in the same domain as the logits (base-2 when exp2); the
    # backward kernel uses the matching convention.
    log_fn = jnp.log2 if exp2 else jnp.log
    lse_ref[0] = (m_f + log_fn(l_f)).reshape(1, bq)


def _fwd(q, k, v, scale, kv_len, block_q, block_kv, interpret, unroll=0,
         exp2=False):
    """q: (BH, Sq, Dp); k/v: (BH, Skv_p, Dp). Returns (out, lse (BH,1,Sq))."""
    bh, sq, dp = q.shape
    skv = k.shape[1]
    grid = (bh, sq // block_q)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_len=kv_len, block_kv=block_kv,
        unroll=unroll, exp2=exp2,
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


def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len,
                       block_kv, heads_per, unroll=0, exp2=False):
    """G-heads-per-program forward: same per-head math as _fwd_kernel, with
    the KV loop body carrying G independent online-softmax chains so Mosaic
    can interleave their MXU dots and VPU softmaxes."""
    G = heads_per
    qs = [q_ref[0, g] for g in range(G)]  # (Bq, Dp) each
    bq, dp = qs[0].shape
    skv_padded = k_ref.shape[2]
    num_kv = skv_padded // block_kv
    masked = kv_len != skv_padded
    exp_fn = jnp.exp2 if exp2 else jnp.exp
    logit_scale = scale * LOG2E if exp2 else scale

    def body(i, carry):
        col = None
        if masked:
            col = jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_kv), 1) + i * block_kv
        out = []
        for g in range(G):
            acc, m_i, l_i = carry[g]
            k = k_ref[0, g, pl.ds(i * block_kv, block_kv), :]
            v = v_ref[0, g, pl.ds(i * block_kv, block_kv), :]
            s = jax.lax.dot_general(
                qs[g], k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * logit_scale
            if masked:
                s = jnp.where(col < kv_len, s, NEG_INF)
            m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
            alpha = exp_fn(m_i - m_new)
            p = exp_fn(s - m_new)
            l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out.append((acc, m_new, l_new))
        return tuple(out)

    carry0 = tuple(
        (jnp.zeros((bq, dp), jnp.float32),
         jnp.full((bq, 1), NEG_INF, jnp.float32),
         jnp.zeros((bq, 1), jnp.float32))
        for _ in range(G)
    )
    if 0 < num_kv <= unroll:
        carry = carry0
        for i in range(num_kv):
            carry = body(i, carry)
    else:
        carry = jax.lax.fori_loop(0, num_kv, body, carry0)

    log_fn = jnp.log2 if exp2 else jnp.log
    for g in range(G):
        acc, m_f, l_f = carry[g]
        o_ref[0, g] = (acc / l_f).astype(o_ref.dtype)
        lse_ref[0, g] = (m_f + log_fn(l_f)).reshape(1, bq)


def _fwd_packed(q, k, v, scale, kv_len, block_q, block_kv, interpret, G,
                unroll=0, exp2=False):
    """Packed-grid forward: q/k/v (BH, S, Dp) with BH % G == 0.
    Returns (out (BH,Sq,Dp), lse (BH,1,Sq)) — same contract as _fwd."""
    bh, sq, dp = q.shape
    skv = k.shape[1]
    q4 = q.reshape(bh // G, G, sq, dp)
    k4 = k.reshape(bh // G, G, skv, dp)
    v4 = v.reshape(bh // G, G, skv, dp)
    grid = (bh // G, sq // block_q)

    kernel = functools.partial(
        _fwd_kernel_packed, scale=scale, kv_len=kv_len, block_kv=block_kv,
        heads_per=G, unroll=unroll, exp2=exp2,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, G, block_q, dp), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, G, skv, dp), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, G, skv, dp), lambda b, i: (b, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, G, block_q, dp), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, G, 1, block_q), lambda b, i: (b, 0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh // G, G, sq, dp), q.dtype),
            jax.ShapeDtypeStruct((bh // G, G, 1, sq), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * skv * dp,
            bytes_accessed=2 * bh * (sq + 2 * skv) * dp * q.dtype.itemsize,
            transcendentals=bh * sq * skv,
        ),
    )(q4, k4, v4)
    return out.reshape(bh, sq, dp), lse.reshape(bh, 1, sq)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, *, scale, kv_len, block_kv, exp2=False, unroll=0,
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
    exp_fn = jnp.exp2 if exp2 else jnp.exp
    logit_scale = scale * LOG2E if exp2 else scale

    dq = jnp.zeros((bq, dp), jnp.float32)

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * logit_scale
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1) + i * block_kv
            s = jnp.where(col < kv_len, s, NEG_INF)
        p = exp_fn(s - lse)  # (Bq, Bk) fp32
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

    if 0 < num_kv <= unroll:
        for i in range(num_kv):
            dq = body(i, dq)
    else:
        dq = jax.lax.fori_loop(0, num_kv, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd(q, k, v, out, lse, do, scale, kv_len, block_q, block_kv, interpret,
         exp2=False, unroll=0):
    bh, sq, dp = q.shape
    skv = k.shape[1]
    grid = (bh, sq // block_q)

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta.reshape(bh, 1, sq)

    kernel = functools.partial(
        _bwd_kernel, scale=scale, kv_len=kv_len, block_kv=block_kv, exp2=exp2,
        unroll=unroll,
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


def head_pack_fits_vmem(G: int, skv: int, dp: int, block_q: int = 512,
                        itemsize: int = 2) -> bool:
    """Whether the packed forward's VMEM residency fits the 16MB scope.

    The packed kernel keeps G FULL KV streams in VMEM (its k/v BlockSpecs
    span the padded sequence), double-buffered, with the head dim
    lane-padded to 128 — at S=4096 that is 4MB per stream pair per G, so
    G=4 blows the scope by itself (observed v5e compile failure: 16.77M >
    16M at G=4/S=4096/d=40).  Mirrors conv_pallas.supported()'s role:
    production routing must never select a config the compiler rejects.
    """
    if G <= 1:
        return True
    lanes = max(128, dp)
    skv_p = _cdiv(skv, 512) * 512 if skv > 512 else skv  # kv pad granularity
    kv_bytes = 2 * 2 * G * skv_p * lanes * itemsize      # dbl-buffered k+v
    qo_bytes = 2 * 2 * G * block_q * lanes * itemsize    # q + out blocks
    acc_bytes = G * block_q * lanes * 4 * 3              # fp32 carries
    return kv_bytes + qo_bytes + acc_bytes <= 12 * 1024 * 1024


def _fwd_dispatch(q, k, v, scale, kv_len, block_q, block_kv, interpret,
                  unroll, exp2, head_pack):
    if (head_pack > 1 and q.shape[0] % head_pack == 0
            and head_pack_fits_vmem(head_pack, k.shape[1], q.shape[-1],
                                    block_q, q.dtype.itemsize)):
        return _fwd_packed(q, k, v, scale, kv_len, block_q, block_kv,
                           interpret, head_pack, unroll, exp2)
    return _fwd(q, k, v, scale, kv_len, block_q, block_kv, interpret, unroll,
                exp2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _flash(q, k, v, scale, kv_len, block_q, block_kv, interpret, unroll=0,
           exp2=False, head_pack=1):
    out, _ = _fwd_dispatch(q, k, v, scale, kv_len, block_q, block_kv,
                           interpret, unroll, exp2, head_pack)
    return out


def _flash_fwd(q, k, v, scale, kv_len, block_q, block_kv, interpret, unroll=0,
               exp2=False, head_pack=1):
    out, lse = _fwd_dispatch(q, k, v, scale, kv_len, block_q, block_kv,
                             interpret, unroll, exp2, head_pack)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, kv_len, block_q, block_kv, interpret, unroll, exp2,
               head_pack, res, do):
    # backward always runs the per-head grid: its dK/dV accumulators are
    # already whole-sequence-resident per program, so head packing would
    # only multiply VMEM pressure (lse/out contracts are identical)
    q, k, v, out, lse = res
    dq, dk, dv = _bwd(q, k, v, out, lse, do, scale, kv_len, block_q, block_kv,
                      interpret, exp2, unroll)
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
    exp2: Optional[bool] = None,
    head_pad: Optional[int] = None,
    head_pack: Optional[int] = None,
) -> jnp.ndarray:
    """(B, Sq, H*D) x (B, Skv, H*D) -> (B, Sq, H*D), differentiable."""
    B, sq, C = q.shape
    skv = k.shape[1]
    head_dim = C // heads
    if scale is None:
        scale = head_dim**-0.5

    if head_pad is None:
        head_pad = DEFAULT_HEAD_PAD
    dp = _round_up(head_dim, head_pad)
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
    if exp2 is None:
        exp2 = DEFAULT_EXP2
    if head_pack is None:
        head_pack = DEFAULT_HEAD_PACK
    out = _flash(qp, kp, vp, float(scale), skv, bq, bkv, interpret,
                 int(unroll), bool(exp2), int(head_pack))
    out = out[:, :sq, :head_dim].reshape(B, heads, sq, head_dim)
    return out.transpose(0, 2, 1, 3).reshape(B, sq, C)
