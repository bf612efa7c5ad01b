"""Attention dispatch: Pallas flash attention on TPU, fused XLA fallback.

Replaces the reference's xformers memory-efficient attention shim
(reference: lora_diffusion/xformers_utils.py:42-70).  The reference probes
whether the xformers backward works per head-dim before enabling
(xformers_utils.py:16-39); here :func:`flash_supported` plays that role as a
static shape-capability check, and callers fall back to the XLA path.

All paths accept (B, S, H*D) tensors and fp32-accumulate the softmax.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_FLASH_ENABLED = True

# Route attention with a KV sequence shorter than this to the XLA path: with
# tiny KV (cross-attention, S_kv=77) the Pallas grid still runs Sq/block_q
# programs per batch*head whose fixed overhead dwarfs the small dot, while
# XLA's fused softmax handles the small score matrix well.  Measured on v5e
# (SD1.5 512^2 50-step txt2img): routing cross-attention to XLA is worth
# ~50 ms/image end-to-end, and XLA beats the kernel on every KV=77 shape in
# isolation (e.g. S=4096: 146 vs 178 ms/image).
FLASH_MIN_KV = int(_os.environ.get("DFT_FLASH_MIN_KV", 256))

# Per-shape dispatch overrides, the granularity analogue of the reference's
# per-BasicTransformerBlock toggle (xformers_utils.py:48-70): a probe failure
# for one (seq, head_dim) disables flash only for the matching call sites.
# Keys are (seq_len_q, head_dim); ``None`` in a slot matches any value.
_SHAPE_OVERRIDES: Dict[Tuple[Optional[int], Optional[int]], bool] = {}


def set_flash_enabled(enabled: bool) -> None:
    """Global switch mirroring set_use_memory_efficient_attention_xformers."""
    global _FLASH_ENABLED
    _FLASH_ENABLED = enabled


def set_flash_override(
    seq_len_q: Optional[int] = None,
    head_dim: Optional[int] = None,
    enabled: Optional[bool] = True,
) -> None:
    """Force flash on/off for attention calls matching (seq_len_q, head_dim).

    ``None`` matches any value in that slot.  Most-specific match wins:
    (sq, d) > (sq, None) > (None, d).  Overrides take precedence over the
    global switch and the built-in heuristics — this is the per-block
    granularity of the reference shim (one bad head dim doesn't take flash
    down everywhere).  ``enabled=None`` removes the override, restoring the
    default dispatch heuristics for that shape."""
    key = (seq_len_q, head_dim)
    if enabled is None:
        _SHAPE_OVERRIDES.pop(key, None)
    else:
        _SHAPE_OVERRIDES[key] = enabled


def clear_flash_overrides() -> None:
    _SHAPE_OVERRIDES.clear()


def _override_for(seq_len_q: int, head_dim: int) -> Optional[bool]:
    for key in ((seq_len_q, head_dim), (seq_len_q, None), (None, head_dim)):
        if key in _SHAPE_OVERRIDES:
            return _SHAPE_OVERRIDES[key]
    return None


def flash_supported(seq_len_q: int, seq_len_kv: int, head_dim: int) -> bool:
    """Static capability probe for the Pallas kernel (analogue of the
    reference's test_xformers_backwards probe, xformers_utils.py:16-39).

    The kernel wants the q sequence to tile by the block size and a head dim
    that is not wastefully padded to the 128-lane width.
    """
    override = _override_for(seq_len_q, head_dim)
    if override is not None:
        return override
    if not _FLASH_ENABLED:
        return False
    if seq_len_q < 256:  # too small to beat the fused XLA path
        return False
    if seq_len_kv < FLASH_MIN_KV:
        return False
    if head_dim > 256:
        return False
    return True


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Plain attention; XLA fuses the softmax chain. (B,Sq,C)x(B,Skv,C)->(B,Sq,C)."""
    B, Sq, C = q.shape
    Skv = k.shape[1]
    head_dim = C // heads
    if scale is None:
        scale = head_dim**-0.5
    q = q.reshape(B, Sq, heads, head_dim)
    k = k.reshape(B, Skv, heads, head_dim)
    v = v.reshape(B, Skv, heads, head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.reshape(B, Sq, C)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Main entry: route to Pallas flash attention when supported."""
    Sq, Skv = q.shape[1], k.shape[1]
    head_dim = q.shape[-1] // heads
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu"
            and flash_supported(Sq, Skv, head_dim)
        )
    if use_flash:
        from . import flash_attention as fa

        return fa.flash_attention(q, k, v, heads, scale)
    return xla_attention(q, k, v, heads, scale)
