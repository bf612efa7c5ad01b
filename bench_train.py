"""Secondary benchmark: DreamBooth rank-4 LoRA training steps/sec on one
chip (BASELINE.md north-star #2: >= 3x A100 steps/sec; an A100 runs the
reference at roughly 2-3 it/s at 512^2 batch 1).

Random SD1.5-shape weights; jitted full train step (VAE encode + CLIP +
UNet fwd/bwd + AdamW), fused STEPS_PER_DISPATCH steps per device dispatch
(training_scripts expose the same knob as --steps_per_dispatch; per-step
dispatch over the remote TPU tunnel costs ~18 ms vs a 57 ms device step).
Prints ONE JSON line like bench.py.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_REFERENCE_STEPS_PER_SEC = 2.5  # typical reference DreamBooth-LoRA rate
STEPS_PER_DISPATCH = int(__import__("os").environ.get("DFT_BENCH_SPD", "10"))
# Per-step train batch size (the reference recipe default is
# train_batch_size=4, /root/reference/training_scripts/train_lora_dreambooth.py:246-248;
# the headline metric stays batch 1 = the run_lorpt.sh recipe).  At B>1 the
# metric name gains a _batchB suffix and the JSON adds images_per_sec.
TRAIN_BATCH = int(__import__("os").environ.get("DFT_BENCH_TRAIN_BATCH", "1"))
# A/B knob: 1 = feed cached latent moments instead of pixels (the trainers'
# --cache_latents path; valid for deterministic pixel pipelines).  Default
# 0 keeps the headline metric = the reference's encode-every-step workload.
CACHE_LATENTS = __import__("os").environ.get("DFT_BENCH_CACHE_LATENTS") == "1"
# A/B knob: 1 = donate the state buffers to the dispatch (XLA aliases the
# pass-through frozen params instead of copying them at dispatch entry/exit)
DONATE = __import__("os").environ.get("DFT_BENCH_DONATE") == "1"
# A/B knob: 1 = bf16 scan carry for master LoRA params + optimizer moments
# (fp32 inside each update; see multi_step carry_dtype — measurement only,
# changes master-state precision between steps)
CARRY_BF16 = __import__("os").environ.get("DFT_BENCH_CARRY_BF16") == "1"
# A/B knob: f32 restores the old fp32 pixel wire format (the DataLoader
# default is uint8 + on-device normalize — 4x less tunnel traffic, a
# rounding-level-equivalent trajectory; see data.dataset.requantize_uint8)
PIX_U8 = __import__("os").environ.get("DFT_BENCH_PIXFMT", "uint8") != "f32"


def main():
    from diffusion_finetuning_tpu import lora as lora_lib
    from diffusion_finetuning_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from diffusion_finetuning_tpu.models.schedulers import DDPMScheduler, SchedulerConfig
    from diffusion_finetuning_tpu.models.unet import UNet2DConditionModel, UNetConfig, unet_lora_targets
    from diffusion_finetuning_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffusion_finetuning_tpu.training.optim import ParamGroup, multi_group_optimizer
    from diffusion_finetuning_tpu.training.train_step import (
        TrainablePartition, build_train_step, jit_train_step, multi_step,
        stack_batches,
    )

    dtype = jnp.bfloat16
    ucfg, vcfg, tcfg = UNetConfig.sd15(), VAEConfig.sd15(), CLIPTextConfig.sd15()
    unet = UNet2DConditionModel(ucfg, dtype=dtype)
    vae = AutoencoderKL(vcfg, dtype=dtype)
    text_encoder = CLIPTextModel(tcfg, dtype=dtype)
    rng = jax.random.PRNGKey(0)

    unet_params = unet.init(
        rng, jnp.zeros((1, 64, 64, 4), dtype), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768), dtype))["params"]
    vae_params = vae.init(rng, jnp.zeros((1, 512, 512, 3), dtype), rng)["params"]
    text_params = text_encoder.init(rng, jnp.zeros((1, 77), jnp.int32))["params"]

    targets = lora_lib.filter_targets(
        unet_lora_targets(ucfg), lora_lib.DEFAULT_TARGET_REPLACE)
    unet_lora = lora_lib.inject_trainable_lora(targets, jax.random.PRNGKey(1), r=4)

    optimizer = multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=1e-4)},
        max_grad_norm=1.0,
    )
    step_fn = build_train_step(
        unet=unet, text_encoder=text_encoder, vae=vae,
        scheduler=DDPMScheduler(SchedulerConfig()), optimizer=optimizer,
        partition=TrainablePartition(unet_lora=True),
    )
    params = {"unet_lora": unet_lora}
    emb = text_params["token_embedding"]["embedding"]
    state = {
        "params": params,
        "static": {
            "unet_params": unet_params, "text_params": text_params,
            "vae_params": vae_params, "orig_embeddings": emb,
            "index_updates": jnp.zeros((emb.shape[0],), bool),
        },
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    k = STEPS_PER_DISPATCH
    fused = multi_step(step_fn, k,
                       carry_dtype=jnp.bfloat16 if CARRY_BF16 else None)
    jitted = jit_train_step(fused, donate=DONATE)
    batch = {
        "pixel_values": np.zeros((TRAIN_BATCH, 512, 512, 3),
                                 np.uint8 if PIX_U8 else np.float32),
        "input_ids": np.zeros((TRAIN_BATCH, 77), np.int32),
    }
    if CACHE_LATENTS:
        from diffusion_finetuning_tpu.training.latent_cache import (
            LatentMomentCache,
        )

        batch = LatentMomentCache(vae, vae_params).transform(batch)
    batches = stack_batches([batch] * k)

    state, m = jitted(state, batches, jax.random.PRNGKey(2))  # compile
    jax.block_until_ready(m["loss"])
    n_dispatch = int(__import__("os").environ.get("DFT_BENCH_NDISPATCH", "10"))
    prefetch = __import__("os").environ.get("DFT_BENCH_PREFETCH", "1") == "1"
    if prefetch:
        # trainer-style dispatch-behind-transfer (FusedDispatcher.prepare):
        # stage dispatch i+1's batch transfer right after enqueueing i, so
        # the host->device move hides under i's device time.  Two distinct
        # host stacks alternate so every dispatch still pays a real
        # transfer (no benchmark-only buffer reuse).
        host_stacks = [stack_batches([batch] * k) for _ in range(2)]
        dev = jax.device_put(host_stacks[0])
        t0 = time.perf_counter()
        for i in range(n_dispatch):
            cur = dev
            state, m = jitted(state, cur, jax.random.PRNGKey(3 + i))
            if i + 1 < n_dispatch:  # the last stage would feed no dispatch
                dev = jax.device_put(host_stacks[(i + 1) % 2])
        jax.block_until_ready(m["loss"])
    else:
        t0 = time.perf_counter()
        for i in range(n_dispatch):
            state, m = jitted(state, batches, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(m["loss"])
    sps = n_dispatch * k / (time.perf_counter() - t0)

    out = {
        "metric": "dreambooth_rank4_512_train_steps_per_sec",
        "value": round(sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps / (3 * A100_REFERENCE_STEPS_PER_SEC), 3),
    }
    if TRAIN_BATCH != 1:
        out["metric"] += f"_batch{TRAIN_BATCH}"
        out["images_per_sec"] = round(sps * TRAIN_BATCH, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
