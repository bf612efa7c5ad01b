"""A/B the host-side half of the fused train step (bench_train workload).

The round-3 device profile (profile_train.py) shows 41.5 ms/step of device
time at steps_per_dispatch=10, but bench_train measures 52.9 ms/step wall —
an ~11 ms/step host gap even with dispatch amortization.  Candidates:

  (a) host->device batch transfer (10 x 512^2x3 fp32 pixels = 31 MB per
      dispatch over the axon tunnel),
  (b) per-call dispatch overhead on the ~1.5k-leaf state pytree,
  (c) device-side output copies of the pass-through frozen params
      (no donation).

This script measures each in isolation, reusing the bench executable from
the persistent compile cache.  Run on the real chip: ``python
scripts/ab_train_host.py``.  One JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")


def main():
    from diffusion_finetuning_tpu import lora as lora_lib
    from diffusion_finetuning_tpu.models.clip_text import (
        CLIPTextConfig, CLIPTextModel)
    from diffusion_finetuning_tpu.models.schedulers import (
        DDPMScheduler, SchedulerConfig)
    from diffusion_finetuning_tpu.models.unet import (
        UNet2DConditionModel, UNetConfig, unet_lora_targets)
    from diffusion_finetuning_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffusion_finetuning_tpu.training.optim import (
        ParamGroup, multi_group_optimizer)
    from diffusion_finetuning_tpu.training.train_step import (
        TrainablePartition, build_train_step, jit_train_step, multi_step,
        stack_batches)

    dtype = jnp.bfloat16
    ucfg, vcfg, tcfg = (UNetConfig.sd15(), VAEConfig.sd15(),
                        CLIPTextConfig.sd15())
    unet = UNet2DConditionModel(ucfg, dtype=dtype)
    vae = AutoencoderKL(vcfg, dtype=dtype)
    text_encoder = CLIPTextModel(tcfg, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    unet_params = unet.init(
        rng, jnp.zeros((1, 64, 64, 4), dtype), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768), dtype))["params"]
    vae_params = vae.init(rng, jnp.zeros((1, 512, 512, 3), dtype), rng)[
        "params"]
    text_params = text_encoder.init(rng, jnp.zeros((1, 77), jnp.int32))[
        "params"]
    targets = lora_lib.filter_targets(
        unet_lora_targets(ucfg), lora_lib.DEFAULT_TARGET_REPLACE)
    unet_lora = lora_lib.inject_trainable_lora(
        targets, jax.random.PRNGKey(1), r=4)
    optimizer = multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=1e-4)}, max_grad_norm=1.0)
    step_fn = build_train_step(
        unet=unet, text_encoder=text_encoder, vae=vae,
        scheduler=DDPMScheduler(SchedulerConfig()), optimizer=optimizer,
        partition=TrainablePartition(unet_lora=True))
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
    k = 10
    jitted = jit_train_step(multi_step(step_fn, k))
    batch = {
        "pixel_values": np.zeros((1, 512, 512, 3), np.float32),
        "input_ids": np.zeros((1, 77), np.int32),
    }
    batches = stack_batches([batch] * k)
    n_leaves = len(jax.tree_util.tree_leaves(state))
    print(json.dumps({"metric": "state_leaves", "value": n_leaves}))

    state, m = jitted(state, batches, jax.random.PRNGKey(2))  # compile/load
    jax.block_until_ready(m["loss"])
    n = 3

    # (a) status quo: numpy batches each dispatch
    t0 = time.perf_counter()
    for i in range(n):
        state, m = jitted(state, batches, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / (n * k) * 1e3
    print(json.dumps({"metric": "ms_per_step_numpy_batches",
                      "value": round(dt, 2)}))

    # (b) batches pre-transferred to device, reused
    dev_batches = jax.device_put(batches)
    jax.block_until_ready(dev_batches)
    t0 = time.perf_counter()
    for i in range(n):
        state, m = jitted(state, dev_batches, jax.random.PRNGKey(6 + i))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / (n * k) * 1e3
    print(json.dumps({"metric": "ms_per_step_device_batches",
                      "value": round(dt, 2)}))

    # (c) raw transfer cost of one k-step batch stack
    for rep in range(3):
        t0 = time.perf_counter()
        db = jax.device_put(batches)
        jax.block_until_ready(db)
        dt = (time.perf_counter() - t0) * 1e3
        print(json.dumps({"metric": "ms_transfer_batch_stack",
                          "rep": rep, "value": round(dt, 2)}))

    # (d) host enqueue overhead: time until the (async) call returns
    t0 = time.perf_counter()
    state2, m2 = jitted(state, dev_batches, jax.random.PRNGKey(9))
    dt = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(m2["loss"])
    print(json.dumps({"metric": "ms_enqueue_return",
                      "value": round(dt, 2)}))

    # (e) uint8 pixels: what the transfer would cost at 1/4 width
    u8 = {"pixel_values": np.zeros((k, 1, 512, 512, 3), np.uint8),
          "input_ids": batches["input_ids"]}
    for rep in range(3):
        t0 = time.perf_counter()
        db = jax.device_put(u8)
        jax.block_until_ready(db)
        dt = (time.perf_counter() - t0) * 1e3
        print(json.dumps({"metric": "ms_transfer_batch_stack_uint8",
                          "rep": rep, "value": round(dt, 2)}))


if __name__ == "__main__":
    main()
