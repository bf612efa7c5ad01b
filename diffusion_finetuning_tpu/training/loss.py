"""Training loss for LoRA / TI fine-tuning — the reference ``loss_step``.

Functional port of cli_lora_pti.py:170-248 and the DreamBooth loop's loss
section (train_lora_dreambooth.py:817-873):

1. ``latents = vae.encode(px).sample() * 0.18215``
2. ``timesteps ~ U[0, T * t_mutliplier)`` per example
3. ``noisy = add_noise(latents, noise, t)``
4. text encoding (LoRA-aware) -> UNet eps/v prediction (LoRA-aware)
5. optional face-mask weighting: nearest-resize mask to the latent grid,
   ``+0.05``, divide by its mean, multiply pred & target
   (cli_lora_pti.py:222-245)
6. fp32 MSE; optional prior-preservation chunked loss
   ``mse(instance) + w * mse(prior)`` (train_lora_dreambooth.py:855-873)

Everything is pure: RNG keys in, scalar loss out — jit/grad/shard_map safe.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.schedulers import DDPMScheduler
from ..models.vae import SCALING_FACTOR


def loss_step(
    rng: jax.Array,
    batch: Dict[str, jnp.ndarray],
    *,
    unet,                 # UNet2DConditionModel
    unet_params,
    text_encoder,         # CLIPTextModel
    text_params,
    vae,                  # AutoencoderKL
    vae_params,
    scheduler: DDPMScheduler,
    unet_lora: Optional[dict] = None,
    text_lora: Optional[dict] = None,
    t_mutliplier: float = 1.0,   # sic — reference parameter name
    with_prior_preservation: bool = False,
    prior_loss_weight: float = 1.0,
) -> jnp.ndarray:
    """batch: pixel_values (B,H,W,3) in [-1,1] — or latent_moments
    (B,h,w,2C) from a LatentMomentCache, skipping the encoder; input_ids
    (B,77); optional mask (B,H,W,1) in [0,1].  With prior preservation the
    batch is [instance; class] stacked along axis 0 (collate order,
    cli_lora_pti.py:136-138)."""
    r_sample, r_noise, r_t = jax.random.split(rng, 3)

    if "latent_moments" in batch:
        from ..models.vae import DiagonalGaussian

        # moments are cached in fp32 (lossless for bf16-encoded values);
        # rebuild the posterior in the VAE's compute dtype so sampling
        # draws the SAME noise realization as the direct encode path —
        # that is the cache's "numerically identical trajectory" contract
        vae_dtype = getattr(vae, "dtype", None) or jnp.float32
        posterior = DiagonalGaussian(
            batch["latent_moments"].astype(vae_dtype))
    else:
        px = batch["pixel_values"]
        if px.dtype == jnp.uint8:
            # uint8 wire format (data.dataset.requantize_uint8): normalize
            # on device (v/255*2-1 in fp32, as to_normalized_array).  XLA
            # reassociates the affine into a fused multiply-add, so pixels
            # land within 1 ulp of the host fp32 path — rounding-level
            # equivalent trajectory at 1/4 the host->device transfer.
            px = px.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        posterior = vae.apply({"params": vae_params}, px, method=vae.encode)
    latents = posterior.sample(r_sample) * SCALING_FACTOR
    latents = jax.lax.stop_gradient(latents.astype(jnp.float32))

    noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
    bsz = latents.shape[0]
    t_max = int(scheduler.num_train_timesteps * t_mutliplier)
    timesteps = jax.random.randint(r_t, (bsz,), 0, t_max)

    noisy = scheduler.add_noise(latents, noise, timesteps)

    text_vars = {"params": text_params}
    if text_lora is not None:
        text_vars["lora"] = text_lora
    encoder_hidden_states = text_encoder.apply(text_vars, batch["input_ids"])

    unet_vars = {"params": unet_params}
    if unet_lora is not None:
        unet_vars["lora"] = unet_lora
    model_pred = unet.apply(
        unet_vars,
        noisy.astype(unet.dtype),
        timesteps,
        encoder_hidden_states.astype(unet.dtype),
    ).astype(jnp.float32)

    target = scheduler.training_target(latents, noise, timesteps)

    mask = batch.get("mask")
    if mask is not None:
        if mask.dtype == jnp.uint8:
            # uint8 wire format (collate_batch): undo face_mask's /255 on
            # device — same rounding-level equivalence as pixel_values
            mask = mask.astype(jnp.float32) / 255.0
        # (B,H,W,1) -> nearest to latent grid, +0.05, /mean
        lh, lw = model_pred.shape[1], model_pred.shape[2]
        mask = jax.image.resize(
            mask.astype(jnp.float32),
            (mask.shape[0], lh, lw, mask.shape[-1]),
            method="nearest",
        )
        mask = mask + 0.05
        mask = mask / jnp.mean(mask)
        if mask.shape[0] < model_pred.shape[0]:
            # prior preservation doubles the batch [instance; class] but
            # face masks exist for the instance examples only — the class
            # half trains unmasked.  (The reference crashes on this flag
            # combination, cli_lora_pti.py:222-245 vs collate 136-156;
            # weighting only the instance half is the sensible semantics.)
            pad = jnp.ones(
                (model_pred.shape[0] - mask.shape[0],) + mask.shape[1:],
                mask.dtype,
            )
            mask = jnp.concatenate([mask, pad], axis=0)
        model_pred = model_pred * mask
        target = target * mask

    if with_prior_preservation:
        pred_i, pred_p = jnp.split(model_pred, 2, axis=0)
        tgt_i, tgt_p = jnp.split(target, 2, axis=0)
        loss = jnp.mean((pred_i - tgt_i) ** 2)
        prior_loss = jnp.mean((pred_p - tgt_p) ** 2)
        return loss + prior_loss_weight * prior_loss

    return jnp.mean((model_pred - target) ** 2)
