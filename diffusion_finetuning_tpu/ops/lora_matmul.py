"""Fused Pallas LoRA dense: ``y = x·W + b + scale·(x·downT)·upT`` in one pass.

The north-star kernel (BASELINE.json): the reference's ``LoraInjectedLinear``
runs base linear and low-rank delta as separate torch modules
(lora.py:32-50); here one Pallas kernel computes both on the MXU per
(M-tile, N-tile) grid step — the base output tile never round-trips HBM
before the delta is added.

Layouts match the framework's trees: ``kernel`` (K, N) flax, ``up`` (N, r)
and ``down`` (r, K) torch on-disk layout (lora.py:41-43).  The rank axis is
zero-padded to the 128-lane width; zero rows/columns contribute nothing.

Backward is a custom VJP in plain XLA (five well-shaped matmuls — XLA fuses
these optimally; the kernel win is in the forward's fused epilogue).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_M = 256
DEFAULT_BLOCK_N = 256


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _kernel(x_ref, w_ref, b_ref, dt_ref, ut_ref, s_ref, o_ref):
    x = x_ref[:]
    acc = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    h = jnp.dot(x, dt_ref[:], preferred_element_type=jnp.float32)  # (bm, rp)
    scale = s_ref[0, 0]
    acc += scale * jnp.dot(
        h.astype(x.dtype), ut_ref[:], preferred_element_type=jnp.float32
    )
    acc += b_ref[:].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _fused(x, w, b, down_t, up_t, scale, block_m, block_n, interpret):
    """x (M,K); w (K,N); b (1,N); down_t (K,rp); up_t (rp,N); scale (1,1)."""
    m, k = x.shape
    n = w.shape[1]
    rp = down_t.shape[1]
    grid = (m // block_m, n // block_n)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((k, rp), lambda i, j: (0, 0)),
            pl.BlockSpec((rp, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k + 2 * m * k * rp + 2 * m * rp * n,
            bytes_accessed=(m * k + k * n + m * n) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w, b, down_t, up_t, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _lora_dense(x, w, b, up, down, scale, block_m, block_n, interpret):
    return _run_fwd(x, w, b, up, down, scale, block_m, block_n, interpret)


def _run_fwd(x, w, b, up, down, scale, block_m, block_n, interpret):
    m, k = x.shape
    n = w.shape[1]
    r = up.shape[1]
    rp = _round_up(max(r, 1), 128)
    bm = min(block_m, _round_up(m, 8))
    bn = min(block_n, _round_up(n, 128))
    mp, np_ = _round_up(m, bm), _round_up(n, bn)

    xp = jnp.pad(x, ((0, mp - m), (0, 0)))
    wp = jnp.pad(w.astype(x.dtype), ((0, 0), (0, np_ - n)))
    bp = jnp.pad(
        jnp.zeros((n,), x.dtype) if b is None else b.astype(x.dtype),
        (0, np_ - n),
    ).reshape(1, np_)
    down_t = jnp.pad(down.astype(x.dtype).T, ((0, 0), (0, rp - r)))  # (K, rp)
    up_t = jnp.pad(up.astype(x.dtype).T, ((0, rp - r), (0, np_ - n)))  # (rp, Np)
    s = jnp.asarray(scale, jnp.float32).reshape(1, 1)

    out = _fused(xp, wp, bp, down_t, up_t, s, bm, bn, interpret)
    return out[:m, :n]


def _lora_dense_fwd(x, w, b, up, down, scale, block_m, block_n, interpret):
    out = _run_fwd(x, w, b, up, down, scale, block_m, block_n, interpret)
    return out, (x, w, up, down, scale, b is not None)


def _lora_dense_bwd(block_m, block_n, interpret, res, g):
    x, w, up, down, scale, has_bias = res
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    upf = up.astype(jnp.float32)
    downf = down.astype(jnp.float32)
    s = jnp.asarray(scale, jnp.float32)

    dx = gf @ w.astype(jnp.float32).T + s * ((gf @ upf) @ downf)
    dw = xf.T @ gf
    db = jnp.sum(gf, axis=0) if has_bias else None
    h = xf @ downf.T                      # (M, r)
    dup = gf.T @ h * s                    # (N, r)
    ddown = (upf.T @ gf.T) @ xf * s       # (r, K)
    dscale = jnp.sum(gf * ((h @ upf.T)))  # scalar
    return (
        dx.astype(x.dtype), dw.astype(w.dtype),
        None if db is None else db,
        dup.astype(up.dtype), ddown.astype(down.dtype),
        dscale.astype(jnp.float32).reshape(jnp.shape(scale)),
    )


_lora_dense.defvjp(_lora_dense_fwd, _lora_dense_bwd)


def lora_dense(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    up: jnp.ndarray,
    down: jnp.ndarray,
    scale,
    block_m: int = DEFAULT_BLOCK_M,
    block_n: int = DEFAULT_BLOCK_N,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused LoRA dense on (..., K) inputs; returns (..., N)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    out = _lora_dense(x2, kernel, bias, up, down, scale, block_m, block_n,
                      interpret)
    return out.reshape(*lead, kernel.shape[1])
