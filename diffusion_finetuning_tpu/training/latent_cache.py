"""Latent-moment caching: skip the per-step VAE encode for repeated pixels.

The reference re-encodes every batch through the VAE encoder on every
training step (train_lora_dreambooth.py:817-819, cli_lora_pti.py:181-184)
even though fine-tuning datasets are a handful of images seen hundreds of
times.  When the pixel pipeline is deterministic (no color jitter), the
encoder output for an image never changes — so the *distribution moments*
(mean, logvar) can be computed once and re-fed, while the per-step
stochastic ``posterior.sample(rng)`` stays inside the jitted train step.
The training trajectory is numerically identical (same moments, same rng
path); only the redundant encoder FLOPs disappear.

Design notes (TPU-shaped):

* Examples are keyed by a hash of their pixel bytes, not a dataset index —
  correct under shuffling, prior-preservation batch doubling, and even
  paired h-flips (a flipped variant simply owns a second cache entry).
  Hashing a 512x512 float image costs ~1 ms on host, hidden behind the
  device step; a cache hit removes the whole encoder from the step.
* Misses encode one example at a time through a shared batch-1 executable
  (one shape -> one compile), so the first epoch pays B dispatches and
  every later epoch pays none.
* Moments are cached as host numpy: (h/8, w/8, 2*latent_channels) fp32 is
  ~24x smaller than the pixels they replace, so the per-step host->device
  transfer shrinks too.

Continuous augmentations (color jitter) would make every hash unique and
silently degrade to encode-per-step plus hashing overhead — trainers
refuse the flag combination instead.
"""

from __future__ import annotations

import hashlib
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


_ENCODE_EXEC_CACHE: Dict = {}


class LatentMomentCache:
    """Replaces ``pixel_values`` with cached ``latent_moments`` in batches.

    ``loss_step`` accepts either key; with ``latent_moments`` it rebuilds
    the ``DiagonalGaussian`` posterior directly and samples as usual.
    """

    def __init__(self, vae, vae_params):
        self.vae = vae
        self.vae_params = vae_params
        key = (vae, getattr(vae, "dtype", None))
        if key not in _ENCODE_EXEC_CACHE:
            def encode(params, px):
                if px.dtype == jnp.uint8:
                    # uint8 wire format: same on-device normalization as
                    # loss_step, so cached moments match the direct path
                    px = px.astype(jnp.float32) / 255.0 * 2.0 - 1.0
                return vae.apply({"params": params}, px, method=vae.encode)

            _ENCODE_EXEC_CACHE[key] = jax.jit(encode)
        self._encode = _ENCODE_EXEC_CACHE[key]
        self._moments: Dict[bytes, np.ndarray] = {}
        self.hits = 0
        self.misses = 0

    def _example_moments(self, px: np.ndarray) -> np.ndarray:
        k = hashlib.sha1(px.tobytes()).digest()
        hit = self._moments.get(k)
        if hit is None:
            post = self._encode(self.vae_params, px[None])
            hit = np.concatenate(
                [np.asarray(post.mean), np.asarray(post.logvar)], axis=-1
            )[0].astype(np.float32)
            self._moments[k] = hit
            self.misses += 1
        else:
            self.hits += 1
        return hit

    def transform(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Return the batch with ``pixel_values`` swapped for
        ``latent_moments`` (other keys untouched)."""
        px = np.asarray(batch["pixel_values"])
        moments = np.stack([self._example_moments(p) for p in px])
        out = {k: v for k, v in batch.items() if k != "pixel_values"}
        out["latent_moments"] = moments
        return out
