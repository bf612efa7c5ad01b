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
    """Enable/disable the flash-attention path (reference xformers shim
    surface, xformers_utils.py:42-70).

    With a UNetConfig, this mirrors the reference's per-BasicTransformerBlock
    walk: every distinct head dim in the model is probed independently and a
    per-head-dim dispatch override is recorded (ops.attention), so a probe
    failure at one block's head dim leaves flash enabled everywhere else.
    Without a config it falls back to the global switch.

    Returns whether flash attention remains enabled for at least one shape.
    """
    cfg = module_or_config
    if cfg is not None and hasattr(cfg, "block_out_channels"):
        if not valid:
            for i, ch in enumerate(cfg.block_out_channels):
                head_dim = int(ch) // cfg.heads_for_block(i)
                attention_ops.set_flash_override(
                    head_dim=head_dim, enabled=False
                )
            return False
        any_ok = False
        for i, ch in enumerate(cfg.block_out_channels):
            head_dim = int(ch) // cfg.heads_for_block(i)
            ok = test_flash_backwards(head_dim)
            # failure pins this head dim to the XLA path; success restores
            # the default dispatch heuristics (it must not force flash on
            # for short sequences that share the head dim)
            attention_ops.set_flash_override(
                head_dim=head_dim, enabled=False if not ok else None
            )
            any_ok = any_ok or ok
        if any_ok:
            # an enable request must also undo a prior global disable —
            # otherwise the per-shape overrides are recorded but
            # flash_supported() still vetoes every shape and we would
            # return True while flash silently stays off
            attention_ops.set_flash_enabled(True)
        return any_ok
    if valid:
        valid = test_flash_backwards(64)
    attention_ops.set_flash_enabled(valid)
    return valid
