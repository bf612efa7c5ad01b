"""Per-HLO-op device-time attribution for the fused training step.

Same methodology as profile_txt2img.py (jax.profiler trace over the axon
tunnel, 'XLA Ops' lane, scan wrapper dropped): captures one fused
DFT_BENCH_SPD-step dispatch of the bench_train.py workload (SD1.5 rank-4
DreamBooth step: VAE encode + CLIP + UNet fwd/bwd + AdamW) and aggregates
device time by op kind, so backward-pass conv/attention/optimizer time can
be attributed before touching any kernel.

Usage: ``python profile_train.py [outdir]`` — prints a table; the raw
trace stays in ``outdir`` for deeper digging.
"""

from __future__ import annotations

import collections
import glob
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from profile_txt2img import kind_of, load_xla_ops  # noqa: E402


def capture(outdir: str):
    import bench_train

    # reuse bench_train's exact setup by running its main once with a trace
    # around the timed region: monkeypatch-free — rebuild the jitted step the
    # same way and trace one dispatch.
    import jax.numpy as jnp
    import numpy as np

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
    vae_params = vae.init(rng, jnp.zeros((1, 512, 512, 3), dtype), rng)["params"]
    text_params = text_encoder.init(rng, jnp.zeros((1, 77), jnp.int32))["params"]
    targets = lora_lib.filter_targets(
        unet_lora_targets(ucfg), lora_lib.DEFAULT_TARGET_REPLACE)
    unet_lora = lora_lib.inject_trainable_lora(
        targets, jax.random.PRNGKey(1), r=4)
    optimizer = multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=1e-4)}, max_grad_norm=1.0)
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
    k = int(os.environ.get("DFT_BENCH_SPD", "10"))
    jitted = jit_train_step(multi_step(step_fn, k))
    pix_u8 = os.environ.get("DFT_BENCH_PIXFMT", "uint8") != "f32"
    batch = {
        "pixel_values": np.zeros((1, 512, 512, 3),
                                 np.uint8 if pix_u8 else np.float32),
        "input_ids": np.zeros((1, 77), np.int32),
    }
    batches = stack_batches([batch] * k)
    state, m = jitted(state, batches, jax.random.PRNGKey(2))  # compile
    jax.block_until_ready(m["loss"])
    with jax.profiler.trace(outdir):
        state, m = jitted(state, batches, jax.random.PRNGKey(3))
        jax.block_until_ready(m["loss"])
    return k


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
    k = int(os.environ.get("DFT_BENCH_SPD", "10"))
    if not glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                     recursive=True):
        k = capture(outdir)

    by_kind = collections.Counter()
    by_op = collections.Counter()
    n_by_op = collections.Counter()
    for name, dur in load_xla_ops(outdir):
        by_kind[kind_of(name)] += dur
        by_op[name] += dur
        n_by_op[name] += 1

    total = sum(by_kind.values())
    print(f"total device op time: {total/1e6:.3f} s over {k} fused steps "
          f"({total/1e3/k:.2f} ms/step)")
    print("\n-- by kind --")
    for kk, v in by_kind.most_common(14):
        print(f"{v/1e6:8.3f} s  {100*v/total:5.1f}%  {kk}")
    print("\n-- top ops --")
    for kk, v in by_op.most_common(30):
        print(f"{v/1e3:8.1f} ms  x{n_by_op[kk]:<5d} {kk[:110]}")


if __name__ == "__main__":
    main()
