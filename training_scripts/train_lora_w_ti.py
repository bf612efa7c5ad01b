"""Joint LoRA + Textual-Inversion trainer with a staged schedule.

Re-implements the reference ``training_scripts/train_lora_w_ti.py``
(parse_args 285-626, main 639-1209): one training loop with three parameter
groups (UNet LoRA, text-encoder LoRA, TI embeddings) where

* steps < ``--unfreeze_lora_step``: LoRA group LRs are forced to 0 (TI-only
  warmup); after: LoRA LRs on, TI LR 0 (train_lora_w_ti.py:988-994);
* after every step, all non-placeholder embedding rows are restored from a
  pre-training clone (train_lora_w_ti.py:1070-1075);
* captions come from the imagenet templates with the
  ``--stochastic_attribute`` random-subset augmentation
  (train_lora_w_ti.py:222-227);
* ``--just_ti`` trains only the embeddings (842-848);
* saves ``lora_weight_e{epoch}_s{step}.pt`` + ``.text_encoder.pt`` +
  ``.ti.pt`` and the final ``pt``/``safe``/``both`` with the TI embed in the
  safetensors (1144-1202).

TPU design: the staged LR switching is expressed as step-dependent schedule
gates inside ONE jitted train step — no recompile at the stage boundary.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_finetuning_tpu import lora as lora_lib
from diffusion_finetuning_tpu.data.dataset import DataLoader, DreamBoothTiDataset
from diffusion_finetuning_tpu.io import torch_pickle
from diffusion_finetuning_tpu.models.clip_text import (
    resize_token_embeddings,
    text_encoder_lora_targets,
)
from diffusion_finetuning_tpu.models.schedulers import DDPMScheduler
from diffusion_finetuning_tpu.models.unet import unet_lora_targets
from diffusion_finetuning_tpu.parallel import mesh as mesh_lib
from diffusion_finetuning_tpu.pipelines.pipeline import StableDiffusionPipeline
from diffusion_finetuning_tpu.training.optim import (
    ParamGroup, StepGate, multi_group_optimizer,
)
from diffusion_finetuning_tpu.training.train_step import (
    FusedDispatcher,
    TrainablePartition,
    build_train_step,
)


def parse_args(input_args=None):
    parser = argparse.ArgumentParser(description="Joint LoRA+TI training (TPU).")
    a = parser.add_argument
    a("--pretrained_model_name_or_path", type=str, default=None, required=True)
    a("--pretrained_vae_name_or_path", type=str, default=None)
    a("--revision", type=str, default=None)
    a("--tokenizer_name", type=str, default=None)
    a("--instance_data_dir", type=str, default=None, required=True)
    a("--class_data_dir", type=str, default=None)
    a("--class_prompt", type=str, default=None)
    a("--placeholder_token", type=str, default=None, required=True)
    a("--stochastic_attribute", type=str, default=None)
    a("--initializer_token", type=str, default=None, required=True)
    a("--learnable_property", type=str, default="object")
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
    # identical trajectory; incompatible with --color_jitter)
    a("--cache_latents", action="store_true")
    a("--train_text_encoder", action="store_true")
    a("--train_batch_size", type=int, default=4)
    a("--sample_batch_size", type=int, default=4)
    # denoise steps for class-image synthesis (reference hardcodes 50)
    a("--class_image_inference_steps", type=int, default=50)
    a("--num_train_epochs", type=int, default=1)
    a("--max_train_steps", type=int, default=None)
    a("--save_steps", type=int, default=500)
    a("--gradient_accumulation_steps", type=int, default=1)
    # fuse this many train steps into ONE device dispatch (see
    # training.train_step.multi_step); amortizes per-dispatch host latency
    a("--steps_per_dispatch", type=int, default=1)
    a("--tensor_parallel", type=int, default=1,
      help="split the frozen UNet/CLIP projections over a tp mesh axis of "
           "this size (Megatron-style) inside the jitted train step")
    a("--gradient_checkpointing", action="store_true")
    a("--lora_rank", type=int, default=4)
    a("--learning_rate", type=float, default=5e-6)
    a("--learning_rate_text", type=float, default=5e-6)
    a("--learning_rate_ti", type=float, default=5e-4)
    a("--unfreeze_lora_step", type=int, default=1500)
    a("--just_ti", action="store_true")
    a("--scale_lr", action="store_true")
    a("--lr_scheduler", type=str, default="constant")
    a("--lr_warmup_steps", type=int, default=500)
    a("--use_8bit_adam", action="store_true")
    a("--adam_beta1", type=float, default=0.9)
    a("--adam_beta2", type=float, default=0.999)
    a("--adam_weight_decay", type=float, default=1e-2)
    a("--adam_epsilon", type=float, default=1e-08)
    a("--max_grad_norm", default=1.0, type=float)
    a("--logging_dir", type=str, default="logs")
    a("--mixed_precision", type=str, default=None, choices=["no", "fp16", "bf16"])
    a("--local_rank", type=int, default=-1)
    a("--resize", type=bool, default=True)
    a("--use_xformers", action="store_true")

    args = parser.parse_args(input_args)
    env_local_rank = int(os.environ.get("LOCAL_RANK", -1))
    if env_local_rank not in (-1, args.local_rank):
        args.local_rank = env_local_rank
    if args.with_prior_preservation:
        if args.class_data_dir is None:
            raise ValueError("You must specify a data directory for class images.")
        if args.class_prompt is None:
            raise ValueError("You must specify prompt for class images.")
    return args


def main(args, dataset_cls=None):
    if dataset_cls is None:
        dataset_cls = DreamBoothTiDataset
    rng = jax.random.PRNGKey(args.seed or 0)
    dtype = jnp.bfloat16 if args.mixed_precision in ("fp16", "bf16") else jnp.float32
    pipe = StableDiffusionPipeline.from_pretrained(
        args.pretrained_model_name_or_path, dtype=dtype
    )
    if args.tokenizer_name:
        # separate tokenizer dir (reference train_lora_w_ti.py:720-724)
        from diffusion_finetuning_tpu.data.tokenizer import CLIPTokenizer

        pipe.tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer_name)
    if args.pretrained_vae_name_or_path:
        # swap in a separately fine-tuned VAE (reference 760-765)
        from diffusion_finetuning_tpu.models import hf_loading

        vcfg = hf_loading.vae_config_from_hf(hf_loading.read_json(
            os.path.join(args.pretrained_vae_name_or_path, "config.json")))
        pipe.vae_params = hf_loading.vae_params_from_hf_state_dict(
            hf_loading.load_model_dir_state_dict(
                args.pretrained_vae_name_or_path), vcfg)
    if args.with_prior_preservation:
        # synthesize the shortfall of class images (reference 671-688)
        from train_lora_dreambooth import synthesize_class_images

        synthesize_class_images(args, pipe)
    tokenizer = pipe.tokenizer

    # install the placeholder token, init from the (single-token) initializer
    num_added = tokenizer.add_tokens(args.placeholder_token)
    if num_added == 0:
        raise ValueError(
            f"The tokenizer already contains the token {args.placeholder_token}."
        )
    init_ids = tokenizer._tokenize_text(args.initializer_token)
    if len(init_ids) > 1:
        raise ValueError("The initializer token must be a single token.")
    placeholder_token_id = tokenizer.convert_tokens_to_ids(args.placeholder_token)
    pipe.text_params = resize_token_embeddings(pipe.text_params, len(tokenizer))
    emb = pipe.text_params["token_embedding"]["embedding"]
    emb = emb.at[placeholder_token_id].set(emb[init_ids[0]])
    pipe.text_params = {**pipe.text_params, "token_embedding": {"embedding": emb}}

    if args.gradient_checkpointing:
        # rematerialize UNet blocks in backward (reference:
        # unet.enable_gradient_checkpointing, train_lora_w_ti.py:804-806)
        import dataclasses as _dc

        from diffusion_finetuning_tpu.models.unet import UNet2DConditionModel

        pipe.unet_config = _dc.replace(pipe.unet_config, gradient_checkpointing=True)
        pipe.unet = UNet2DConditionModel(pipe.unet_config, dtype=pipe.dtype)
    if args.use_xformers:
        # probe + enable flash attention per head dim (reference
        # train_lora_w_ti.py:800-802; on TPU flash is on by default, this
        # re-probes and records per-shape capability)
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
    unet_lora = lora_lib.inject_trainable_lora(unet_targets, k1, r=args.lora_rank)
    text_lora = lora_lib.inject_trainable_lora(text_targets, k2, r=args.lora_rank)

    scheduler = DDPMScheduler(pipe.scheduler_config)

    train_dataset = dataset_cls(
        instance_data_root=args.instance_data_dir,
        placeholder_token=args.placeholder_token,
        stochastic_attribute=args.stochastic_attribute,
        learnable_property=args.learnable_property,
        class_data_root=args.class_data_dir if args.with_prior_preservation else None,
        class_prompt=args.class_prompt,
        tokenizer=tokenizer,
        size=args.resolution,
        center_crop=args.center_crop,
        color_jitter=args.color_jitter,
        resize=args.resize,
        seed=args.seed,
    )
    pad_id = tokenizer.encoder[tokenizer.pad_token]
    loader = DataLoader(train_dataset, args.train_batch_size, pad_id,
                        seed=args.seed or 0)

    steps_per_epoch = math.ceil(len(loader) / args.gradient_accumulation_steps)
    if args.max_train_steps is None:
        args.max_train_steps = args.num_train_epochs * steps_per_epoch
    num_train_epochs = math.ceil(args.max_train_steps / steps_per_epoch)

    lr, lr_text, lr_ti = (args.learning_rate, args.learning_rate_text,
                          args.learning_rate_ti)
    if args.scale_lr:
        scale = args.gradient_accumulation_steps * args.train_batch_size
        lr, lr_text, lr_ti = lr * scale, lr_text * scale, lr_ti * scale

    unfreeze = args.unfreeze_lora_step
    common = dict(
        schedule=args.lr_scheduler, warmup_steps=args.lr_warmup_steps,
        total_steps=args.max_train_steps, weight_decay=args.adam_weight_decay,
        betas=(args.adam_beta1, args.adam_beta2), eps=args.adam_epsilon,
        step_multiplier=args.gradient_accumulation_steps,
    )
    if args.just_ti:
        groups = {"ti_embeddings": ParamGroup(lr=lr_ti, **common)}
        params = {"ti_embeddings": emb}
        partition = TrainablePartition(unet_lora=False, text_lora=False, ti=True)
    else:
        groups = {
            "unet_lora": ParamGroup(
                lr=lr, lr_gate=StepGate(unfreeze), **common),
            "text_lora": ParamGroup(
                lr=lr_text, lr_gate=StepGate(unfreeze), **common),
            "ti_embeddings": ParamGroup(
                lr=lr_ti, lr_gate=StepGate(unfreeze, on_after=False), **common),
        }
        params = {"unet_lora": unet_lora, "text_lora": text_lora,
                  "ti_embeddings": emb}
        partition = TrainablePartition(unet_lora=True, text_lora=True, ti=True)

    optimizer = multi_group_optimizer(
        groups, grad_accum_steps=args.gradient_accumulation_steps,
        max_grad_norm=args.max_grad_norm, use_8bit=args.use_8bit_adam,
    )
    # clip_ti_decay=False: w_ti restores frozen rows but has no norm decay
    step_fn = build_train_step(
        unet=pipe.unet, text_encoder=pipe.text_encoder, vae=pipe.vae,
        scheduler=scheduler, optimizer=optimizer, partition=partition,
        with_prior_preservation=args.with_prior_preservation,
        prior_loss_weight=args.prior_loss_weight,
        clip_ti_decay=False,
        grad_accum_steps=args.gradient_accumulation_steps,
    )

    vocab_rows = emb.shape[0]
    index_updates = jnp.zeros((vocab_rows,), bool).at[placeholder_token_id].set(True)
    eff_batch = args.train_batch_size * (2 if args.with_prior_preservation else 1)
    mesh = mesh_lib.trainer_mesh(eff_batch, args.tensor_parallel)

    state = {
        "params": params,
        "static": {
            "unet_params": pipe.unet_params,
            "text_params": pipe.text_params,
            "vae_params": pipe.vae_params,
            "orig_embeddings": emb,
            "index_updates": index_updates,
        },
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    state_shardings = None
    if mesh is not None and mesh.shape.get("tp", 1) > 1:
        state_shardings = mesh_lib.tp_state_shardings(mesh, state)
    dispatcher = FusedDispatcher(
        step_fn, spd=max(1, args.steps_per_dispatch), mesh=mesh,
        state_shardings=state_shardings)
    if mesh is not None:
        state = (mesh_lib.replicate(state, mesh) if state_shardings is None
                 else mesh_lib.shard_tree(state, state_shardings))

    print("***** Running training *****")
    print(f"  Num examples = {len(train_dataset)}")
    print(f"  Num Epochs = {num_train_epochs}")
    print(f"  Total optimization steps = {args.max_train_steps}")

    os.makedirs(args.output_dir, exist_ok=True)
    global_step, last_save = 0, 0

    # loss + per-group lr + steps/s to tensorboard (reference logs loss/lr
    # per step via Accelerator(log_with="tensorboard") + accelerator.log,
    # train_lora_w_ti.py:645, 1161)
    from diffusion_finetuning_tpu.training.optim import lr_schedule as _lr_sched
    from diffusion_finetuning_tpu.utils.profiling import MetricLogger, StepTimer

    logger = MetricLogger(
        log_dir=os.path.join(args.output_dir, args.logging_dir)
        if mesh_lib.is_main_process() else None
    )
    timer = StepTimer()
    _base_lrs = {
        "lr": _lr_sched(args.lr_scheduler, lr, args.lr_warmup_steps,
                        args.max_train_steps),
        "lr_text": _lr_sched(args.lr_scheduler, lr_text, args.lr_warmup_steps,
                             args.max_train_steps),
        "lr_ti": _lr_sched(args.lr_scheduler, lr_ti, args.lr_warmup_steps,
                           args.max_train_steps),
    }

    def _lrs_at(step):
        # host-side mirror of the in-jit staged gating (ParamGroup.lr_gate)
        if args.just_ti:
            return {"lr_ti": float(_base_lrs["lr_ti"](step))}
        on = float(step >= unfreeze)
        return {
            "lr": float(_base_lrs["lr"](step)) * on,
            "lr_text": float(_base_lrs["lr_text"](step)) * on,
            "lr_ti": float(_base_lrs["lr_ti"](step)) * (1.0 - on),
        }

    def save_periodic(sh, epoch, step):
        base = f"{args.output_dir}/lora_weight_e{epoch}_s{step}"
        if not args.just_ti:
            lora_lib.save_lora_weight(sh["params"]["unet_lora"], unet_targets,
                                      base + ".pt")
            lora_lib.save_lora_weight(sh["params"]["text_lora"], text_targets,
                                      base + ".text_encoder.pt")
        row = np.asarray(sh["params"]["ti_embeddings"])[placeholder_token_id]
        torch_pickle.save({args.placeholder_token: row}, base + ".ti.pt")
        print(f"save weights {base}.pt")

    latent_cache = None
    if getattr(args, "cache_latents", False):
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
        # staged LR gating flips at unfreeze_lora_step inside the jit, so
        # fused groups are safe across the boundary; clip only to the end
        take = min(dispatcher.spd, args.max_train_steps - gs)
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
            logger.log({"loss": loss, "steps_per_sec": timer.steps_per_sec,
                        **_lrs_at(global_step)}, global_step)
        if (args.save_steps and global_step - last_save >= args.save_steps
                and mesh_lib.is_main_process()):
            save_periodic(jax.device_get(state), epoch, global_step)
            last_save = global_step

    mesh_lib.barrier("end of training")
    logger.close()
    sh = jax.device_get(state)
    print("\n\nLora TRAINING DONE!\n\n")

    if mesh_lib.is_main_process():
        row = np.asarray(sh["params"]["ti_embeddings"])[placeholder_token_id]
        if args.output_format in ("pt", "both"):
            if not args.just_ti:
                lora_lib.save_lora_weight(
                    sh["params"]["unet_lora"], unet_targets,
                    args.output_dir + "/lora_weight.pt")
                lora_lib.save_lora_weight(
                    sh["params"]["text_lora"], text_targets,
                    args.output_dir + "/lora_weight.text_encoder.pt")
            torch_pickle.save({args.placeholder_token: row},
                              args.output_dir + "/lora_weight.ti.pt")
        if args.output_format in ("safe", "both") and not args.just_ti:
            lora_lib.save_all(
                sh["params"]["unet_lora"], sh["params"]["text_lora"],
                unet_targets, text_targets,
                {args.placeholder_token: row},
                args.output_dir + "/lora_weight.safetensors",
            )
    return sh


if __name__ == "__main__":
    main(parse_args())
