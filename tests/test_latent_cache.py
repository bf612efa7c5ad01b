"""--cache_latents: per-step VAE encode replaced by cached moments.

The trajectory must match the encode-every-step reference semantics
(train_lora_dreambooth.py:817-819) to float-fusion noise, and continuous
pixel augmentation must be refused.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "training_scripts"))

from diffusion_finetuning_tpu.training.latent_cache import LatentMomentCache
from diffusion_finetuning_tpu.training.loss import loss_step


def _tiny_models():
    from diffusion_finetuning_tpu.models.clip_text import (
        CLIPTextConfig, CLIPTextModel,
    )
    from diffusion_finetuning_tpu.models.unet import (
        UNet2DConditionModel, UNetConfig,
    )
    from diffusion_finetuning_tpu.models.vae import AutoencoderKL, VAEConfig
    from tests.jitutil import jit_init

    ucfg, vcfg, tcfg = UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny()
    unet, vae, text = (UNet2DConditionModel(ucfg), AutoencoderKL(vcfg),
                       CLIPTextModel(tcfg))
    rng = jax.random.PRNGKey(0)
    up = jit_init(unet)(rng, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 77, ucfg.cross_attention_dim)))["params"]
    vp = jit_init(vae)(rng, jnp.zeros((1, 16, 16, 3)), rng)["params"]
    tp = jit_init(text)(rng, jnp.zeros((1, 77), jnp.int32))["params"]
    return unet, up, vae, vp, text, tp


def test_loss_with_cached_moments_matches_encode_path():
    from diffusion_finetuning_tpu.models.schedulers import (
        DDPMScheduler, SchedulerConfig,
    )

    unet, up, vae, vp, text, tp = _tiny_models()
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": rng.standard_normal((2, 16, 16, 3)).astype(np.float32),
        "input_ids": np.full((2, 77), 2, np.int32),
    }
    cache = LatentMomentCache(vae, vp)
    cached_batch = cache.transform(batch)
    assert "pixel_values" not in cached_batch
    # tiny VAE: one downsample (2 blocks), 4 latent channels -> 8 moments
    assert cached_batch["latent_moments"].shape == (2, 8, 8, 8)

    kw = dict(unet=unet, unet_params=up, text_encoder=text, text_params=tp,
              vae=vae, vae_params=vp,
              scheduler=DDPMScheduler(SchedulerConfig()))
    key = jax.random.PRNGKey(3)
    l_px = jax.jit(lambda b: loss_step(key, b, **kw))(
        jax.tree_util.tree_map(jnp.asarray, batch))
    l_mo = jax.jit(lambda b: loss_step(key, b, **kw))(
        jax.tree_util.tree_map(jnp.asarray, cached_batch))
    # identical math, same rng path; only encode fusion reassociation differs
    np.testing.assert_allclose(float(l_px), float(l_mo), rtol=1e-5)

    # repeat transform: every example is a hit, no new encodes
    misses = cache.misses
    cache.transform(batch)
    assert cache.misses == misses and cache.hits >= 2

    # a flipped variant is simply a second entry, not a failure
    cache.transform({**batch,
                     "pixel_values": batch["pixel_values"][:, :, ::-1]})
    assert cache.misses == misses + 2


def test_dreambooth_cache_latents_cli(tmp_path):
    import train_lora_dreambooth as db
    from PIL import Image

    from diffusion_finetuning_tpu.io import torch_pickle
    from diffusion_finetuning_tpu.models import hf_export
    from tests.test_cli_tools import _tiny_pipe, _write_tokenizer

    pipe = _tiny_pipe()
    model_dir = str(tmp_path / "model")
    hf_export.save_pretrained(pipe, model_dir)
    _write_tokenizer(pipe.tokenizer, os.path.join(model_dir, "tokenizer"))
    inst = tmp_path / "inst"
    inst.mkdir()
    Image.fromarray(np.full((16, 16, 3), 128, np.uint8)).save(inst / "a.png")

    def run(out, extra):
        # config matches the steps_per_dispatch test (test_dreambooth.py) so
        # the uncached executable is shared; only the cached variant traces
        args = db.parse_args([
            "--pretrained_model_name_or_path", model_dir,
            "--instance_data_dir", str(inst),
            "--instance_prompt", "a photo of sks",
            "--output_dir", out,
            "--resolution", "16",
            "--train_batch_size", "1",
            "--max_train_steps", "2",
            "--save_steps", "0",
            "--lora_rank", "1",
            "--learning_rate", "1e-3",
            "--output_format", "pt",
            "--seed", "11",
            "--steps_per_dispatch", "2",
        ] + extra)
        return db.main(args)

    run(str(tmp_path / "o_base"), [])
    run(str(tmp_path / "o_cached"), ["--cache_latents"])
    base = torch_pickle.load(str(tmp_path / "o_base" / "lora_weight.pt"))
    cached = torch_pickle.load(str(tmp_path / "o_cached" / "lora_weight.pt"))
    for a, b in zip(base, cached):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=2e-4)

    # continuous augmentation is refused, not silently degraded
    with pytest.raises(ValueError, match="color_jitter"):
        run(str(tmp_path / "o_bad"), ["--cache_latents", "--color_jitter"])

def test_cached_moments_match_encode_path_in_bf16():
    """The identical-trajectory contract must hold for bf16 trainers too:
    moments are cached fp32 (lossless for bf16-encoded values) and the
    posterior is rebuilt in the VAE's compute dtype, so the per-step
    ``sample(rng)`` draws the SAME noise realization either way."""
    from diffusion_finetuning_tpu.models.schedulers import (
        DDPMScheduler, SchedulerConfig,
    )
    from diffusion_finetuning_tpu.models.clip_text import (
        CLIPTextConfig, CLIPTextModel,
    )
    from diffusion_finetuning_tpu.models.unet import (
        UNet2DConditionModel, UNetConfig,
    )
    from diffusion_finetuning_tpu.models.vae import AutoencoderKL, VAEConfig
    from tests.jitutil import jit_init

    ucfg, vcfg, tcfg = UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny()
    unet = UNet2DConditionModel(ucfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    text = CLIPTextModel(tcfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    up = jit_init(unet)(rng, jnp.zeros((1, 8, 8, 4), jnp.bfloat16),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 77, ucfg.cross_attention_dim),
                                  jnp.bfloat16))["params"]
    vp = jit_init(vae)(rng, jnp.zeros((1, 16, 16, 3), jnp.bfloat16), rng)["params"]
    tp = jit_init(text)(rng, jnp.zeros((1, 77), jnp.int32))["params"]

    rng_np = np.random.default_rng(0)
    batch = {
        "pixel_values": rng_np.standard_normal((2, 16, 16, 3)).astype(np.float32),
        "input_ids": np.full((2, 77), 2, np.int32),
    }
    cached_batch = LatentMomentCache(vae, vp).transform(batch)

    # the posterior must be rebuilt in the VAE dtype so the per-step noise
    # DRAW matches the direct path: jax.random.normal in fp32 vs bf16 is a
    # different realization entirely, which is the bug this pins against.
    from diffusion_finetuning_tpu.models.vae import DiagonalGaussian

    key = jax.random.PRNGKey(3)
    r_sample = jax.random.split(key, 3)[0]
    direct = jax.jit(
        lambda px: vae.apply({"params": vp}, px, method=vae.encode)
        .sample(r_sample))(jnp.asarray(batch["pixel_values"], jnp.bfloat16))
    cached = jax.jit(
        lambda m: DiagonalGaussian(m.astype(jnp.bfloat16)).sample(r_sample))(
        jnp.asarray(cached_batch["latent_moments"]))
    assert cached.dtype == direct.dtype == jnp.bfloat16
    # batch-2 vs batch-1 encode fusion reassociates bf16 sums, so the
    # moments (and thus latents) can differ by a few bf16 ulps (eps~0.4%);
    # a wrong-dtype noise draw differs O(1)
    np.testing.assert_allclose(
        np.asarray(direct, np.float32), np.asarray(cached, np.float32),
        atol=0.05)

    kw = dict(unet=unet, unet_params=up, text_encoder=text, text_params=tp,
              vae=vae, vae_params=vp,
              scheduler=DDPMScheduler(SchedulerConfig()))
    l_px = jax.jit(lambda b: loss_step(key, b, **kw))(
        jax.tree_util.tree_map(jnp.asarray, batch))
    l_mo = jax.jit(lambda b: loss_step(key, b, **kw))(
        jax.tree_util.tree_map(jnp.asarray, cached_batch))
    # same noise realization; residual is bf16 reassociation through the UNet
    np.testing.assert_allclose(float(l_px), float(l_mo), rtol=2e-2)
