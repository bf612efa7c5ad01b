"""DreamBooth-with-LoRA trainer (TPU-native).

Re-implements the reference ``training_scripts/train_lora_dreambooth.py``
(argparse surface 168-483, main 486-1003) on the JAX training core:

* prior-preservation class-image synthesis with sha1 filenames, generating
  only the shortfall (reference 512-558);
* rank-r LoRA injection into the UNet (+ optional text encoder) with
  ``--resume_unet`` / ``--resume_text_encoder`` warm starts (595-621);
* AdamW with separate text-encoder LR, optional int8 optimizer state
  (the bitsandbytes stand-in), LR schedules, ``--scale_lr``, grad
  accumulation, global-norm clipping (632-676, 737-742);
* DDPM noise training loop with optional prior-preservation chunked loss
  (811-888) — ONE jitted train step over the data-parallel mesh (the
  Accelerate/NCCL DDP replacement; gradient all-reduce is emitted by XLA);
* periodic ``lora_weight_e{epoch}_s{step}.pt`` saves and final
  ``pt``/``safe``/``both`` output (889-994).
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_finetuning_tpu import lora as lora_lib
from diffusion_finetuning_tpu.data.dataset import DataLoader, DreamBoothDataset, PromptDataset
from diffusion_finetuning_tpu.models.clip_text import text_encoder_lora_targets
from diffusion_finetuning_tpu.models.schedulers import DDPMScheduler
from diffusion_finetuning_tpu.models.unet import unet_lora_targets
from diffusion_finetuning_tpu.parallel import mesh as mesh_lib
from diffusion_finetuning_tpu.pipelines.pipeline import StableDiffusionPipeline
from diffusion_finetuning_tpu.training.optim import ParamGroup, multi_group_optimizer
from diffusion_finetuning_tpu.training.train_step import (
    FusedDispatcher,
    TrainablePartition,
    build_train_step,
)


def parse_args(input_args=None):
    parser = argparse.ArgumentParser(description="DreamBooth LoRA training (TPU).")
    a = parser.add_argument
    a("--pretrained_model_name_or_path", type=str, default=None, required=True)
    a("--pretrained_vae_name_or_path", type=str, default=None)
    a("--revision", type=str, default=None)
    a("--tokenizer_name", type=str, default=None)
    a("--instance_data_dir", type=str, default=None, required=True)
    a("--class_data_dir", type=str, default=None)
    a("--instance_prompt", type=str, default=None, required=True)
    a("--class_prompt", type=str, default=None)
    a("--with_prior_preservation", default=False, action="store_true")
    a("--prior_loss_weight", type=float, default=1.0)
    a("--num_class_images", type=int, default=100)
    a("--output_dir", type=str, default="text-inversion-model")
    a("--output_format", type=str, choices=["pt", "safe", "both"], default="both")
    a("--seed", type=int, default=None)
    a("--resolution", type=int, default=512)
    a("--center_crop", action="store_true")
    a("--color_jitter", action="store_true")
    # encode each distinct image once instead of every step (numerically
    # identical trajectory: the stochastic posterior sample stays in-step);
    # incompatible with --color_jitter (continuous pixel augmentation)
    a("--cache_latents", action="store_true")
    a("--train_text_encoder", action="store_true")
    a("--train_batch_size", type=int, default=4)
    a("--sample_batch_size", type=int, default=4)
    # denoise steps for prior-preservation class-image synthesis (the
    # reference hardcodes the pipeline default of 50,
    # train_lora_dreambooth.py:539); lower = faster synthesis
    a("--class_image_inference_steps", type=int, default=50)
    a("--num_train_epochs", type=int, default=1)
    a("--max_train_steps", type=int, default=None)
    a("--save_steps", type=int, default=500)
    a("--gradient_accumulation_steps", type=int, default=1)
    # fuse this many train steps into ONE device dispatch (lax.scan over
    # stacked prefetched batches) — amortizes per-dispatch host/RPC latency,
    # which dominates on remote TPU runtimes (~18 ms/step measured via the
    # tunnel).  Deterministic given the seed, but the RNG key stream differs
    # from per-step dispatch, so changing this value changes the sampled
    # noise/timesteps (like changing the seed does).
    a("--steps_per_dispatch", type=int, default=1)
    a("--tensor_parallel", type=int, default=1,
      help="split the frozen UNet/CLIP projections over a tp mesh axis of "
           "this size (Megatron-style) inside the jitted train step")
    a("--gradient_checkpointing", action="store_true")
    a("--lora_rank", type=int, default=4)
    a("--learning_rate", type=float, default=5e-6)
    a("--learning_rate_text", type=float, default=5e-6)
    a("--scale_lr", action="store_true")
    a("--lr_scheduler", type=str, default="constant")
    a("--lr_warmup_steps", type=int, default=500)
    a("--use_8bit_adam", action="store_true")
    a("--adam_beta1", type=float, default=0.9)
    a("--adam_beta2", type=float, default=0.999)
    a("--adam_weight_decay", type=float, default=1e-2)
    a("--adam_epsilon", type=float, default=1e-08)
    a("--max_grad_norm", default=1.0, type=float)
    a("--push_to_hub", action="store_true")
    a("--hub_token", type=str, default=None)
    a("--logging_dir", type=str, default="logs")
    a("--mixed_precision", type=str, default=None, choices=["no", "fp16", "bf16"])
    a("--local_rank", type=int, default=-1)
    a("--resume_unet", type=str, default=None)
    a("--resume_text_encoder", type=str, default=None)
    a("--resize", type=bool, default=True, required=False)
    a("--use_xformers", action="store_true",
      help="(TPU: flash attention is on by default; kept for CLI parity)")
    a("--full_state_checkpoint_dir", type=str, default=None,
      help="Save/auto-resume the FULL train state (params+optimizer+step) "
           "here every save_steps — fault-tolerant resume beyond the "
           "reference's weights-only checkpoints.")

    args = parser.parse_args(input_args)
    env_local_rank = int(os.environ.get("LOCAL_RANK", -1))
    if env_local_rank not in (-1, args.local_rank):
        args.local_rank = env_local_rank

    if args.with_prior_preservation:
        if args.class_data_dir is None:
            raise ValueError("You must specify a data directory for class images.")
        if args.class_prompt is None:
            raise ValueError("You must specify prompt for class images.")
    else:
        if args.class_data_dir is not None:
            print("You need not use --class_data_dir without --with_prior_preservation.")
        if args.class_prompt is not None:
            print("You need not use --class_prompt without --with_prior_preservation.")
    return args


def synthesize_class_images(args, pipe: StableDiffusionPipeline):
    """Generate the shortfall of prior-preservation class images
    (reference train_lora_dreambooth.py:512-558)."""
    from pathlib import Path

    class_images_dir = Path(args.class_data_dir)
    class_images_dir.mkdir(parents=True, exist_ok=True)
    cur_class_images = len(list(class_images_dir.iterdir()))
    if cur_class_images >= args.num_class_images:
        return
    num_new_images = args.num_class_images - cur_class_images
    print(f"Number of class images to sample: {num_new_images}.")
    sample_dataset = PromptDataset(args.class_prompt, num_new_images)
    bs = args.sample_batch_size
    for i in range(0, len(sample_dataset), bs):
        prompts = [sample_dataset[j]["prompt"]
                   for j in range(i, min(i + bs, len(sample_dataset)))]
        images = pipe(
            prompts,
            num_inference_steps=getattr(args, "class_image_inference_steps", 50),
            height=args.resolution, width=args.resolution, seed=i,
        )
        for j, image in enumerate(images):
            h = hashlib.sha1(image.tobytes()).hexdigest()
            image.save(class_images_dir / f"{cur_class_images + i + j}-{h}.jpg")


def main(args):
    if args.seed is not None:
        np.random.seed(args.seed)
    rng = jax.random.PRNGKey(args.seed or 0)

    dtype = jnp.bfloat16 if args.mixed_precision in ("fp16", "bf16") else jnp.float32
    pipe = StableDiffusionPipeline.from_pretrained(
        args.pretrained_model_name_or_path, dtype=dtype
    )
    if args.tokenizer_name:
        # separate tokenizer dir (reference train_lora_dreambooth.py:566-571)
        from diffusion_finetuning_tpu.data.tokenizer import CLIPTokenizer

        pipe.tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer_name)
    if args.pretrained_vae_name_or_path:
        # swap in a separately fine-tuned VAE (reference 581-587)
        from diffusion_finetuning_tpu.models import hf_loading

        vcfg = hf_loading.vae_config_from_hf(hf_loading.read_json(
            os.path.join(args.pretrained_vae_name_or_path, "config.json")))
        pipe.vae_params = hf_loading.vae_params_from_hf_state_dict(
            hf_loading.load_model_dir_state_dict(
                args.pretrained_vae_name_or_path), vcfg)
    if args.push_to_hub:
        print("WARNING: --push_to_hub is accepted for CLI parity but this "
              "build has no hub access; outputs stay in --output_dir.")

    if args.with_prior_preservation:
        synthesize_class_images(args, pipe)

    if args.gradient_checkpointing:
        import dataclasses as _dc

        from diffusion_finetuning_tpu.models.unet import UNet2DConditionModel

        pipe.unet_config = _dc.replace(pipe.unet_config, gradient_checkpointing=True)
        pipe.unet = UNet2DConditionModel(pipe.unet_config, dtype=pipe.dtype)

    if args.use_xformers:
        # probe + enable flash attention per head dim (reference
        # train_lora_dreambooth.py:623-625; on TPU flash is on by default,
        # this re-probes and records per-shape capability)
        from diffusion_finetuning_tpu.xformers_utils import (
            set_use_memory_efficient_attention_xformers,
        )

        set_use_memory_efficient_attention_xformers(pipe.unet_config)

    unet_targets = lora_lib.filter_targets(
        unet_lora_targets(pipe.unet_config), lora_lib.DEFAULT_TARGET_REPLACE
    )
    text_targets = lora_lib.filter_targets(
        text_encoder_lora_targets(pipe.text_config),
        lora_lib.TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    )
    rng, k1, k2 = jax.random.split(rng, 3)
    unet_lora = lora_lib.inject_trainable_lora(
        unet_targets, k1, r=args.lora_rank, loras=args.resume_unet
    )
    print("Before training: Unet First Layer lora up",
          np.asarray(lora_lib.extract_lora_ups_down(unet_lora, unet_targets)[0][0]))
    text_lora = None
    if args.train_text_encoder:
        text_lora = lora_lib.inject_trainable_lora(
            text_targets, k2, r=args.lora_rank, loras=args.resume_text_encoder
        )
        print("Before training: text encoder First Layer lora up",
              np.asarray(lora_lib.extract_lora_ups_down(text_lora, text_targets)[0][0]))

    scheduler = DDPMScheduler(pipe.scheduler_config)

    train_dataset = DreamBoothDataset(
        instance_data_root=args.instance_data_dir,
        instance_prompt=args.instance_prompt,
        class_data_root=args.class_data_dir if args.with_prior_preservation else None,
        class_prompt=args.class_prompt,
        tokenizer=pipe.tokenizer,
        size=args.resolution,
        center_crop=args.center_crop,
        color_jitter=args.color_jitter,
        resize=args.resize,
        seed=args.seed,
    )
    pad_id = pipe.tokenizer.encoder[pipe.tokenizer.pad_token]
    loader = DataLoader(train_dataset, args.train_batch_size, pad_id,
                        seed=args.seed or 0)

    steps_per_epoch = math.ceil(len(loader) / args.gradient_accumulation_steps)
    if args.max_train_steps is None:
        args.max_train_steps = args.num_train_epochs * steps_per_epoch
    num_train_epochs = math.ceil(args.max_train_steps / steps_per_epoch)

    if args.scale_lr:
        lr = (args.learning_rate * args.gradient_accumulation_steps
              * args.train_batch_size * jax.process_count())
        lr_text = (args.learning_rate_text * args.gradient_accumulation_steps
                   * args.train_batch_size * jax.process_count())
    else:
        lr, lr_text = args.learning_rate, args.learning_rate_text

    groups = {
        "unet_lora": ParamGroup(
            lr=lr, schedule=args.lr_scheduler, warmup_steps=args.lr_warmup_steps,
            total_steps=args.max_train_steps, weight_decay=args.adam_weight_decay,
            betas=(args.adam_beta1, args.adam_beta2), eps=args.adam_epsilon,
            step_multiplier=args.gradient_accumulation_steps,
        )
    }
    if args.train_text_encoder:
        groups["text_lora"] = ParamGroup(
            lr=lr_text, schedule=args.lr_scheduler, warmup_steps=args.lr_warmup_steps,
            total_steps=args.max_train_steps, weight_decay=args.adam_weight_decay,
            betas=(args.adam_beta1, args.adam_beta2), eps=args.adam_epsilon,
            step_multiplier=args.gradient_accumulation_steps,
        )

    optimizer = multi_group_optimizer(
        groups, grad_accum_steps=args.gradient_accumulation_steps,
        max_grad_norm=args.max_grad_norm, use_8bit=args.use_8bit_adam,
    )

    partition = TrainablePartition(
        unet_lora=True, text_lora=args.train_text_encoder, ti=False
    )
    step_fn = build_train_step(
        unet=pipe.unet, text_encoder=pipe.text_encoder, vae=pipe.vae,
        scheduler=scheduler, optimizer=optimizer, partition=partition,
        with_prior_preservation=args.with_prior_preservation,
        prior_loss_weight=args.prior_loss_weight,
    )

    eff_batch = args.train_batch_size * (2 if args.with_prior_preservation else 1)
    mesh = mesh_lib.trainer_mesh(eff_batch, args.tensor_parallel)
    spd = max(1, args.steps_per_dispatch)

    params = {"unet_lora": unet_lora}
    if args.train_text_encoder:
        params["text_lora"] = text_lora
    state = {
        "params": params,
        "static": {
            "unet_params": pipe.unet_params,
            "text_params": pipe.text_params,
            "vae_params": pipe.vae_params,
            "orig_embeddings": pipe.text_params["token_embedding"]["embedding"],
            "index_updates": jnp.zeros(
                (pipe.text_params["token_embedding"]["embedding"].shape[0],), bool
            ),
        },
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    if args.full_state_checkpoint_dir:
        from diffusion_finetuning_tpu.training.checkpoint import (
            latest_checkpoint,
            restore_train_state,
        )

        ckpt = latest_checkpoint(args.full_state_checkpoint_dir)
        if ckpt:
            print(f"Resuming full train state from {ckpt}")
            state = restore_train_state(ckpt, state)

    state_shardings = None
    if mesh is not None and mesh.shape.get("tp", 1) > 1:
        state_shardings = mesh_lib.tp_state_shardings(mesh, state)
    dispatcher = FusedDispatcher(
        step_fn, spd=spd, mesh=mesh, state_shardings=state_shardings)
    if mesh is not None:
        state = (mesh_lib.replicate(state, mesh) if state_shardings is None
                 else mesh_lib.shard_tree(state, state_shardings))

    total_batch = (args.train_batch_size * jax.process_count()
                   * args.gradient_accumulation_steps)
    print("***** Running training *****")
    print(f"  Num examples = {len(train_dataset)}")
    print(f"  Num Epochs = {num_train_epochs}")
    print(f"  Instantaneous batch size per device = {args.train_batch_size}")
    print(f"  Total train batch size (w. parallel, distributed & accumulation) = {total_batch}")
    print(f"  Gradient Accumulation steps = {args.gradient_accumulation_steps}")
    print(f"  Total optimization steps = {args.max_train_steps}")

    os.makedirs(args.output_dir, exist_ok=True)
    global_step = int(jax.device_get(state["step"]))
    last_save = global_step
    if global_step:
        print(f"Resumed at step {global_step}")

    # loss/lr scalars to tensorboard (reference: accelerator.log,
    # train_lora_dreambooth.py:959-961) + rolling step-time stats
    from diffusion_finetuning_tpu.utils.profiling import MetricLogger, StepTimer

    logger = MetricLogger(
        log_dir=os.path.join(args.output_dir, args.logging_dir)
        if mesh_lib.is_main_process() else None
    )
    timer = StepTimer()
    # host-side mirror of the UNet group's schedule for the lr scalar
    # (reference logs lr_scheduler.get_last_lr()[0], :959-961)
    from diffusion_finetuning_tpu.training.optim import lr_schedule as _lr_sched

    lr_now = _lr_sched(args.lr_scheduler, lr, args.lr_warmup_steps,
                       args.max_train_steps)

    def save_periodic(state_host, epoch, step):
        filename_unet = f"{args.output_dir}/lora_weight_e{epoch}_s{step}.pt"
        print(f"save weights {filename_unet}")
        lora_lib.save_lora_weight(
            state_host["params"]["unet_lora"], unet_targets, filename_unet
        )
        if args.train_text_encoder:
            lora_lib.save_lora_weight(
                state_host["params"]["text_lora"], text_targets,
                f"{args.output_dir}/lora_weight_e{epoch}_s{step}.text_encoder.pt",
            )

    latent_cache = None
    if args.cache_latents:
        if args.color_jitter:
            raise ValueError(
                "--cache_latents requires deterministic pixels; drop "
                "--color_jitter (h-flips are fine: each orientation gets "
                "its own cache entry)"
            )
        from diffusion_finetuning_tpu.training.latent_cache import (
            LatentMomentCache,
        )

        latent_cache = LatentMomentCache(pipe.vae, pipe.vae_params)

    def batch_stream():
        for epoch in range(num_train_epochs):
            for batch in loader:
                if latent_cache is not None:
                    batch = latent_cache.transform(batch)
                yield epoch, batch

    stream = batch_stream()
    stream_epoch = [0]

    def take_group(gs):
        take = min(spd, args.max_train_steps - gs)
        group = []
        for epoch, batch in stream:
            stream_epoch[0] = epoch
            group.append(batch)
            if len(group) == take:
                break
        return group

    for state, losses, stepped, global_step in dispatcher.drive(
            state, rng, take_group, args.max_train_steps,
            start_step=global_step):
        epoch = stream_epoch[0]
        for _ in range(stepped):
            timer.tick()
        if global_step % 50 < stepped or global_step >= args.max_train_steps:
            loss = float(jax.device_get(losses)[-1])
            print(f"step {global_step}/{args.max_train_steps} "
                  f"loss={loss:.4f} ({timer.steps_per_sec:.2f} steps/s)")
            logger.log({"loss": loss, "lr": float(lr_now(global_step)),
                        "steps_per_sec": timer.steps_per_sec}, global_step)
        if (args.save_steps and global_step - last_save >= args.save_steps
                and mesh_lib.is_main_process()):
            # fetch once, without the multi-GB frozen static params
            host = jax.device_get(
                {k: v for k, v in state.items() if k != "static"}
            )
            save_periodic(host, epoch, global_step)
            if args.full_state_checkpoint_dir:
                from diffusion_finetuning_tpu.training.checkpoint import (
                    save_train_state,
                )

                save_train_state(
                    args.full_state_checkpoint_dir, host, step=global_step,
                )
            last_save = global_step

    mesh_lib.barrier("end of training")
    logger.close()
    state = jax.device_get(state)
    print("\n\nLora TRAINING DONE!\n\n")

    if mesh_lib.is_main_process():
        if args.output_format in ("pt", "both"):
            lora_lib.save_lora_weight(
                state["params"]["unet_lora"], unet_targets,
                args.output_dir + "/lora_weight.pt",
            )
            if args.train_text_encoder:
                lora_lib.save_lora_weight(
                    state["params"]["text_lora"], text_targets,
                    args.output_dir + "/lora_weight.text_encoder.pt",
                )
        if args.output_format in ("safe", "both"):
            modelmap = {
                "unet": (state["params"]["unet_lora"], unet_targets,
                         lora_lib.UNET_DEFAULT_TARGET_REPLACE)
            }
            if args.train_text_encoder:
                modelmap["text_encoder"] = (
                    state["params"]["text_lora"], text_targets,
                    lora_lib.TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
                )
            lora_lib.save_safeloras(
                modelmap, args.output_dir + "/lora_weight.safetensors"
            )
    return state


if __name__ == "__main__":
    main(parse_args())
