"""Learning-rate sweep for DreamBooth-LoRA through ONE compiled train step.

The reference README spends a section on hand-picking the LoRA learning
rate ("use bigger lr than you normally would", README.md:328-343) — the
actual workflow is a sweep.  A naive sweep recompiles the train step per
LR (a trace constant); over the remote-compile TPU tunnel that is 10-30
minutes *per point*.  Here the LR is a runtime opt_state leaf
(``multi_group_optimizer(runtime_lr_scale=True)`` +
``set_lr_scale``), so every point after the first dispatches in
milliseconds.

Usage:
    python scripts/sweep_lr.py MODEL_DIR INSTANCE_DIR out/ \
        --prompt "a photo of sks" --base_lr 1e-4 --scales "0.25,1,4" \
        --steps 200 --rank 4

Writes ``out/sweep.json`` (per-scale loss trajectories) and the best
point's LoRA as ``out/lora_best.pt``.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_finetuning_tpu import lora as lora_lib
from diffusion_finetuning_tpu.data.dataset import DataLoader, DreamBoothDataset
from diffusion_finetuning_tpu.models.schedulers import DDPMScheduler
from diffusion_finetuning_tpu.pipelines.pipeline import StableDiffusionPipeline
from diffusion_finetuning_tpu.training.optim import (
    ParamGroup, multi_group_optimizer, set_lr_scale,
)
from diffusion_finetuning_tpu.training.train_step import (
    FusedDispatcher, TrainablePartition, build_train_step,
)
from diffusion_finetuning_tpu.utils.cli import Fire


def run(
    pretrained_model_name_or_path: str,
    instance_data_dir: str,
    output_dir: str,
    prompt: str = "a photo of sks",
    base_lr: float = 1e-4,
    scales: str = "0.25,0.5,1,2,4",
    steps: int = 200,
    rank: int = 4,
    resolution: int = 512,
    batch_size: int = 1,
    seed: int = 0,
    steps_per_dispatch: int = 10,
    cache_latents: bool = True,
    mixed_precision: str = "bf16",
):
    os.makedirs(output_dir, exist_ok=True)
    if isinstance(scales, (tuple, list)):  # Fire parses "a,b,c" to a tuple
        scale_list = [float(s) for s in scales]
    else:
        scale_list = [float(s) for s in str(scales).split(",")]

    dtype = jnp.bfloat16 if mixed_precision in ("fp16", "bf16") else jnp.float32
    pipe = StableDiffusionPipeline.from_pretrained(
        pretrained_model_name_or_path, dtype=dtype)
    dataset = DreamBoothDataset(
        instance_data_root=instance_data_dir, instance_prompt=prompt,
        tokenizer=pipe.tokenizer, size=resolution, seed=seed,
    )
    pad_id = pipe.tokenizer.encoder[pipe.tokenizer.pad_token]

    targets = pipe.lora_targets("unet", lora_lib.DEFAULT_TARGET_REPLACE)
    optimizer = multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=base_lr, total_steps=steps)},
        max_grad_norm=1.0, runtime_lr_scale=True,
    )
    step_fn = build_train_step(
        unet=pipe.unet, text_encoder=pipe.text_encoder, vae=pipe.vae,
        scheduler=DDPMScheduler(pipe.scheduler_config), optimizer=optimizer,
        partition=TrainablePartition(unet_lora=True),
    )
    dispatcher = FusedDispatcher(step_fn, spd=steps_per_dispatch)

    latent_cache = None
    if cache_latents:
        from diffusion_finetuning_tpu.training.latent_cache import (
            LatentMomentCache,
        )

        latent_cache = LatentMomentCache(pipe.vae, pipe.vae_params)

    emb = pipe.text_params["token_embedding"]["embedding"]
    static = {
        "unet_params": pipe.unet_params, "text_params": pipe.text_params,
        "vae_params": pipe.vae_params, "orig_embeddings": emb,
        "index_updates": jnp.zeros((emb.shape[0],), bool),
    }

    results, best = {}, (None, np.inf, None)
    for scale in scale_list:
        # identical init per point: only the runtime LR scale differs
        params = {"unet_lora": lora_lib.inject_trainable_lora(
            targets, jax.random.PRNGKey(seed + 1), r=rank)}
        state = {
            "params": params, "static": static,
            "opt_state": set_lr_scale(
                optimizer.init(params), "unet_lora", scale),
            "step": jnp.zeros((), jnp.int32),
        }
        loader = DataLoader(dataset, batch_size, pad_id, seed=seed)
        rng = jax.random.PRNGKey(seed)

        # one epoch-looping stream per scale (the trainers' batch_stream
        # pattern): restarting `for batch in loader` per dispatch group
        # would spawn a fresh prefetch worker every ~spd steps and train on
        # shuffled epoch PREFIXES instead of full epochs
        def batch_stream():
            while True:
                for batch in loader:
                    if latent_cache is not None:
                        batch = latent_cache.transform(batch)
                    yield batch

        stream = batch_stream()
        losses, done = [], 0
        while done < steps:
            take = min(steps_per_dispatch, steps - done)
            group = [batch for _, batch in zip(range(take), stream)]
            rng, key = jax.random.split(rng)
            state, ls = dispatcher.run(state, group, key)
            losses.extend(np.asarray(ls).tolist())
            done += len(group)

        tail = float(np.mean(losses[-max(1, len(losses) // 4):]))
        results[scale] = {"lr": base_lr * scale, "tail_loss": tail,
                          "losses": losses}
        print(f"lr={base_lr * scale:g} (scale {scale}): tail loss {tail:.5f}")
        if tail < best[1]:
            best = (scale, tail, jax.device_get(state["params"]["unet_lora"]))

    with open(os.path.join(output_dir, "sweep.json"), "w") as f:
        json.dump({str(k): v for k, v in results.items()}, f, indent=1)
    lora_lib.save_lora_weight(
        best[2], targets, os.path.join(output_dir, "lora_best.pt"))
    print(f"best: scale {best[0]} (lr {base_lr * best[0]:g}) -> "
          f"{output_dir}/lora_best.pt; trajectories in sweep.json")


if __name__ == "__main__":
    Fire(run)
