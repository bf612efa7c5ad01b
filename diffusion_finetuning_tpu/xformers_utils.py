"""Memory-efficient-attention shim (xformers parity surface).

The reference gates xformers attention behind a cached *runtime probe* that
checks the CUDA backward actually works per head-dim before enabling it
(reference xformers_utils.py:16-39), then walks BasicTransformerBlocks
toggling it per block (42-70).

TPU equivalent: attention already routes through the Pallas flash-attention
kernel with an XLA fallback (ops/attention.py).  This module keeps the
reference's public surface:

* :func:`test_flash_backwards` — jit+grad a tiny attention at the given
  size and confirm the Pallas backward compiles and produces finite grads
  (the capability probe);
* :func:`set_use_memory_efficient_attention_xformers` — global enable/
  disable, consulting the probe like the reference does per head-dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ops import attention as attention_ops


@functools.lru_cache(maxsize=None)
def test_flash_backwards(size: int) -> bool:
    """Probe that the flash-attention backward works for head dim ``size``
    (analogue of reference test_xformers_backwards, xformers_utils.py:16-39).
    """
    try:
        heads = 1
        q = jnp.ones((1, 256, heads * size), jnp.float32)

        def loss(q):
            out = attention_ops.attention(q, q, q, heads, use_flash=True)
            return jnp.sum(out ** 2)

        g = jax.jit(jax.grad(loss))(q)
        return bool(jnp.isfinite(g).all())
    except Exception as e:  # kernel unsupported for this shape/backend
        print("Error enabling memory efficient attention for flash:", e)
        return False


def set_use_memory_efficient_attention_xformers(
    module_or_config=None, valid: bool = True
) -> bool:
    """Enable/disable the flash-attention path globally (the functional
    equivalent of walking the module tree in the reference, 42-70).

    ``module_or_config`` may be a UNetConfig to derive the head dim for the
    probe; returns whether flash attention is enabled after the call."""
    if valid:
        size = 64
        if module_or_config is not None and hasattr(module_or_config, "block_out_channels"):
            cfg = module_or_config
            size = int(cfg.block_out_channels[0]) // cfg.heads_for_block(0)
        valid = test_flash_backwards(size)
    attention_ops.set_flash_enabled(valid)
    return valid
