"""``lora_pti`` — two-phase Pivotal Tuning Inversion trainer (the flagship).

TPU-native re-implementation of the reference CLI
(cli_lora_pti.py:47-770):

* **get_models** — load pipeline components, add "|"-separated placeholder
  tokens, init their embedding rows from ``<rand-sigma>`` / ``<zero>`` /
  a single initializer token (cli_lora_pti.py:70-107).
* **Phase 1 (inversion)** — train only the placeholder embedding rows with
  AdamW + per-batch LR schedule + gradient accumulation; on each optimizer
  step renorm updated rows toward norm 0.4 with ``lambda = min(1, 100*lr)``
  and restore all frozen rows (cli_lora_pti.py:251-405).
* **Phase 2 (tuning)** — inject rank-r LoRA into the UNet, optionally keep
  inverting the embeddings (``continue_inversion``, unconstrained) and/or
  train text-encoder LoRA; ``t_mutliplier=0.8``, global-norm grad clip 1.0
  (cli_lora_pti.py:408-489, 693-766).
* Checkpoints: ``step_inv_N.safetensors`` (TI only) and
  ``step_N.safetensors`` (LoRA + TI) via ``save_all``.

TPU design: each phase is ONE jitted train step (loss+grads+optimizer+TI
constraints) compiled once and driven by a host loop; the batch is sharded
over the mesh's ``data`` axis when more than one device is present.
"""

from __future__ import annotations

import itertools
import os
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import lora as lora_lib
from .data.dataset import DataLoader, PivotalTuningDatasetCapation
from .models.clip_text import resize_token_embeddings, text_encoder_lora_targets
from .models.schedulers import DDPMScheduler
from .models.unet import unet_lora_targets
from .parallel import mesh as mesh_lib
from .pipelines.pipeline import StableDiffusionPipeline
from .training.optim import ParamGroup, lr_schedule, multi_group_optimizer
from .training.train_step import (
    FusedDispatcher, TrainablePartition, build_train_step,
)
from .utils.cli import Fire


def get_models(
    pretrained_model_name_or_path: str,
    pretrained_vae_name_or_path: Optional[str],
    revision: Optional[str],
    placeholder_tokens: List[str],
    initializer_tokens: List[str],
    device: str = "tpu",
    dtype=jnp.float32,
):
    """Load the pipeline and install placeholder tokens
    (reference cli_lora_pti.py:47-126)."""
    del revision, device
    pipe = StableDiffusionPipeline.from_pretrained(
        pretrained_model_name_or_path, dtype=dtype
    )
    if pretrained_vae_name_or_path:
        from .models import hf_loading

        vcfg = hf_loading.vae_config_from_hf(
            hf_loading.read_json(
                os.path.join(pretrained_vae_name_or_path, "config.json")
            )
        )
        pipe.vae_params = hf_loading.vae_params_from_hf_state_dict(
            hf_loading.load_model_dir_state_dict(pretrained_vae_name_or_path), vcfg
        )

    tokenizer = pipe.tokenizer
    placeholder_token_ids = []
    rng = np.random.default_rng(0)
    for token, init_tok in zip(placeholder_tokens, initializer_tokens):
        num_added = tokenizer.add_tokens(token)
        if num_added == 0:
            raise ValueError(
                f"The tokenizer already contains the token {token}. Please pass"
                " a different `placeholder_token` that is not already in the"
                " tokenizer."
            )
        token_id = tokenizer.convert_tokens_to_ids(token)
        placeholder_token_ids.append(token_id)

        pipe.text_params = resize_token_embeddings(pipe.text_params, len(tokenizer))
        emb = pipe.text_params["token_embedding"]["embedding"]
        dim = emb.shape[1]
        if init_tok.startswith("<rand"):
            sigma_val = float(re.findall(r"<rand-(.*)>", init_tok)[0])
            row = rng.standard_normal(dim).astype(np.float32) * sigma_val
            print(
                f"Initialized {token} with random noise (sigma={sigma_val}), "
                f"empirically {row.mean():.3f} +- {row.std():.3f}"
            )
            print(f"Norm : {np.linalg.norm(row):.4f}")
        elif init_tok == "<zero>":
            row = np.zeros(dim, np.float32)
        else:
            init_ids = tokenizer._tokenize_text(init_tok)
            if len(init_ids) > 1:
                raise ValueError("The initializer token must be a single token.")
            row = np.asarray(emb[init_ids[0]])
        emb = emb.at[token_id].set(jnp.asarray(row))
        pipe.text_params = {
            **pipe.text_params,
            "token_embedding": {"embedding": emb},
        }
    return pipe, placeholder_token_ids


def _save_checkpoint(pipe, state, partition, unet_targets, text_targets,
                     placeholder_tokens, placeholder_token_ids, path,
                     save_lora=True):
    if partition.ti:
        emb = np.asarray(state["params"]["ti_embeddings"])
    else:
        emb = np.asarray(pipe.text_params["token_embedding"]["embedding"])
    learned = {
        tok: emb[tid]
        for tok, tid in zip(placeholder_tokens, placeholder_token_ids)
    }
    lora_lib.save_all(
        state["params"].get("unet_lora"),
        state["params"].get("text_lora"),
        unet_targets,
        text_targets,
        learned,
        path,
        save_lora=save_lora,
    )


def _mean_moved(tree) -> float:
    vals = list(itertools.chain(*lora_lib.inspect_lora(tree).values()))
    return float(np.mean(vals)) if vals else 0.0


def train(
    instance_data_dir: str,
    pretrained_model_name_or_path: str,
    output_dir: str,
    train_text_encoder: bool = False,
    pretrained_vae_name_or_path: Optional[str] = None,
    revision: Optional[str] = None,
    class_data_dir: Optional[str] = None,
    stochastic_attribute: Optional[str] = None,
    perform_inversion: bool = True,
    use_template: Optional[str] = None,
    placeholder_tokens: str = "<s>",
    placeholder_token_at_data: Optional[str] = None,
    initializer_tokens: Optional[str] = None,
    class_prompt: Optional[str] = None,
    with_prior_preservation: bool = False,
    prior_loss_weight: float = 1.0,
    num_class_images: int = 100,
    seed: int = 42,
    resolution: int = 512,
    color_jitter: bool = True,
    train_batch_size: int = 1,
    sample_batch_size: int = 1,
    max_train_steps_tuning: int = 1000,
    max_train_steps_ti: int = 1000,
    save_steps: int = 100,
    gradient_accumulation_steps: int = 4,
    gradient_checkpointing: bool = False,
    mixed_precision: str = "fp16",
    lora_rank: int = 4,
    lora_unet_target_modules=lora_lib.UNET_DEFAULT_TARGET_REPLACE,
    lora_clip_target_modules=lora_lib.TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    clip_ti_decay: bool = True,
    learning_rate_unet: float = 1e-4,
    learning_rate_text: float = 1e-5,
    learning_rate_ti: float = 5e-4,
    continue_inversion: bool = True,
    continue_inversion_lr: Optional[float] = None,
    use_face_segmentation_condition: bool = False,
    scale_lr: bool = False,
    lr_scheduler: str = "linear",
    lr_warmup_steps: int = 0,
    lr_scheduler_lora: str = "linear",
    lr_warmup_steps_lora: int = 0,
    weight_decay_ti: float = 0.00,
    weight_decay_lora: float = 0.001,
    use_8bit_adam: bool = False,
    steps_per_dispatch: int = 1,
    tensor_parallel: int = 1,
    device: str = "tpu",
    extra_args: Optional[dict] = None,
    log_wandb: bool = False,
    wandb_log_prompt_cnt: int = 10,
    wandb_project_name: str = "new_pti_project",
    wandb_entity: str = "new_pti_entity",
):
    if log_wandb:
        import wandb

        wandb.init(
            project=wandb_project_name,
            entity=wandb_entity,
            name=f"steps_{max_train_steps_ti}_lr_{learning_rate_ti}_"
                 f"{instance_data_dir.split('/')[-1]}",
            reinit=True,
            config={"lr": learning_rate_ti, **(extra_args or {})},
        )

    if output_dir is not None:
        os.makedirs(output_dir, exist_ok=True)

    placeholder_tokens = placeholder_tokens.split("|")
    if initializer_tokens is None:
        print("PTI : Initializer Token not give, random inits")
        initializer_tokens = ["<rand-0.017>"] * len(placeholder_tokens)
    else:
        initializer_tokens = initializer_tokens.split("|")
    assert len(initializer_tokens) == len(placeholder_tokens), (
        "Unequal Initializer token for Placeholder tokens."
    )
    class_token = "".join(initializer_tokens)

    if placeholder_token_at_data is not None:
        tok, pat = placeholder_token_at_data.split("|")
        token_map = {tok: pat}
    else:
        token_map = {"DUMMY": "".join(placeholder_tokens)}

    print("Placeholder Tokens", placeholder_tokens)
    print("Initializer Tokens", initializer_tokens)

    dtype = jnp.bfloat16 if mixed_precision in ("fp16", "bf16") else jnp.float32
    pipe, placeholder_token_ids = get_models(
        pretrained_model_name_or_path,
        pretrained_vae_name_or_path,
        revision,
        placeholder_tokens,
        initializer_tokens,
        device=device,
        dtype=dtype,
    )
    if gradient_checkpointing:
        import dataclasses as _dc

        pipe.unet_config = _dc.replace(pipe.unet_config, gradient_checkpointing=True)
        from .models.unet import UNet2DConditionModel

        pipe.unet = UNet2DConditionModel(pipe.unet_config, dtype=pipe.dtype)

    noise_scheduler = DDPMScheduler(pipe.scheduler_config)

    if scale_lr:
        unet_lr = learning_rate_unet * gradient_accumulation_steps * train_batch_size
        text_encoder_lr = learning_rate_text * gradient_accumulation_steps * train_batch_size
        ti_lr = learning_rate_ti * gradient_accumulation_steps * train_batch_size
    else:
        unet_lr, text_encoder_lr, ti_lr = (
            learning_rate_unet, learning_rate_text, learning_rate_ti
        )

    train_dataset = PivotalTuningDatasetCapation(
        instance_data_root=instance_data_dir,
        stochastic_attribute=stochastic_attribute,
        token_map=token_map,
        use_template=use_template,
        class_data_root=class_data_dir if with_prior_preservation else None,
        class_prompt=class_prompt,
        tokenizer=pipe.tokenizer,
        size=resolution,
        color_jitter=color_jitter,
        use_face_segmentation_condition=use_face_segmentation_condition,
        seed=seed,
    )
    train_dataset.blur_amount = 200

    pad_id = pipe.tokenizer.encoder[pipe.tokenizer.pad_token]
    loader = DataLoader(train_dataset, train_batch_size, pad_id, seed=seed)

    # mask over embedding *rows* (>= len(tokenizer): the matrix only grows)
    vocab = pipe.text_params["token_embedding"]["embedding"].shape[0]
    index_updates = np.zeros((vocab,), bool)
    for tid in placeholder_token_ids:
        index_updates[tid] = True
    index_updates = jnp.asarray(index_updates)

    unet_targets = lora_lib.filter_targets(
        unet_lora_targets(pipe.unet_config), set(lora_unet_target_modules)
    )
    text_targets = lora_lib.filter_targets(
        text_encoder_lora_targets(pipe.text_config), set(lora_clip_target_modules)
    )

    # DP mesh over as many devices as the per-step batch divides (prior
    # preservation doubles the batch at collate time); tensor_parallel>1
    # additionally splits the frozen UNet/CLIP projections over a tp axis
    eff_batch = train_batch_size * (2 if with_prior_preservation else 1)
    mesh = mesh_lib.trainer_mesh(eff_batch, tensor_parallel)
    rng = jax.random.PRNGKey(seed)

    preped_clip = None
    if log_wandb:
        try:
            from .utils.eval import prepare_clip_model_sets

            preped_clip = prepare_clip_model_sets()
        except Exception as e:  # offline environments: log loss only
            print(f"wandb eval: CLIP models unavailable ({e}); logging loss only")

    def run_phase(partition, optimizer, num_steps, save_name, t_mutliplier,
                  ti_sched, label, accum=1):
        nonlocal rng
        loss_sum = 0.0
        state = {
            "params": {},
            "static": {
                "unet_params": pipe.unet_params,
                "text_params": pipe.text_params,
                "vae_params": pipe.vae_params,
                "orig_embeddings": pipe.text_params["token_embedding"]["embedding"],
                "index_updates": index_updates,
            },
            "opt_state": None,
            "step": jnp.zeros((), jnp.int32),
        }
        if partition.unet_lora:
            state["params"]["unet_lora"] = pipe.unet_lora
        if partition.text_lora:
            state["params"]["text_lora"] = pipe.text_encoder_lora
        if partition.ti:
            state["params"]["ti_embeddings"] = (
                pipe.text_params["token_embedding"]["embedding"]
            )
        state["opt_state"] = optimizer.init(state["params"])

        step_fn = build_train_step(
            unet=pipe.unet, text_encoder=pipe.text_encoder, vae=pipe.vae,
            scheduler=noise_scheduler, optimizer=optimizer,
            partition=partition, t_mutliplier=t_mutliplier,
            with_prior_preservation=with_prior_preservation,
            prior_loss_weight=prior_loss_weight,
            clip_ti_decay=clip_ti_decay, ti_lr_schedule=ti_sched,
            grad_accum_steps=accum,
        )
        # clamp to the save window so every full group fuses with ONE
        # executable (groups are clipped at save boundaries below)
        spd = max(1, steps_per_dispatch)
        if save_steps:
            spd = min(spd, save_steps)
        state_shardings = None
        if mesh is not None and mesh.shape.get("tp", 1) > 1:
            state_shardings = mesh_lib.tp_state_shardings(mesh, state)
        dispatcher = FusedDispatcher(step_fn, spd=spd, mesh=mesh,
                                     state_shardings=state_shardings)
        if mesh is not None:
            state = (mesh_lib.replicate(state, mesh)
                     if state_shardings is None
                     else mesh_lib.shard_tree(state, state_shardings))

        def batch_stream():
            while True:
                for batch in loader:
                    yield batch

        stream = batch_stream()

        def take_group(gs):
            # never straddle a save/eval boundary with a fused group, so
            # checkpoint cadence matches the reference exactly
            # save_steps=0 means "never save periodically" (the reference
            # crashes on 0 — cli_lora_pti.py:359 '% save_steps' — but a
            # production trainer honors the obvious contract)
            until_save = (
                save_steps - (gs % save_steps) if save_steps
                else num_steps - gs
            )
            take = min(dispatcher.spd, num_steps - gs, until_save)
            return [next(stream) for _ in range(take)]

        global_step = 0
        for state, losses, take, global_step in dispatcher.drive(
                state, rng, take_group, num_steps):
            if log_wandb:
                # device scalar: converting to float here would block on
                # every step and serialize host/device
                loss_sum = loss_sum + jnp.sum(losses)
            if global_step % 50 < take or global_step == num_steps:
                print(f"{label} step {global_step}/{num_steps} "
                      f"loss={float(losses[-1]):.4f}")
            if save_steps and global_step % save_steps == 0:
                host = jax.device_get(
                    {k: v for k, v in state.items() if k != "static"}
                )
                _save_checkpoint(
                    pipe, host, partition, unet_targets,
                    text_targets, placeholder_tokens, placeholder_token_ids,
                    os.path.join(output_dir, save_name.format(global_step)),
                    save_lora=partition.unet_lora,
                )
                # reference logs loss + CLIP alignment at inversion save
                # points (cli_lora_pti.py:370-402)
                if log_wandb and label == "inversion":
                    import wandb

                    wandb.log({"loss": float(loss_sum) / save_steps})
                    loss_sum = 0.0
                    if preped_clip is not None:
                        from PIL import Image as _Image

                        from .utils.eval import evaluate_pipe

                        sh = host
                        pipe.text_params = {
                            **pipe.text_params,
                            "token_embedding": {"embedding": jnp.asarray(
                                sh["params"]["ti_embeddings"])},
                        }
                        images = [
                            _Image.open(os.path.join(instance_data_dir, f))
                            for f in os.listdir(instance_data_dir)
                            if f.endswith((".png", ".jpg"))
                        ]
                        wandb.log(evaluate_pipe(
                            pipe, target_images=images,
                            class_token=class_token,
                            learnt_token="".join(placeholder_tokens),
                            n_test=wandb_log_prompt_cnt, n_step=50,
                            clip_model_sets=preped_clip,
                        ))
                if partition.unet_lora:
                    print("LORA Unet Moved",
                          _mean_moved(host["params"]["unet_lora"]))
                if partition.text_lora:
                    print("LORA CLIP Moved",
                          _mean_moved(host["params"]["text_lora"]))
            if global_step >= num_steps:
                return jax.device_get(state)
        return jax.device_get(state)

    # ---- PHASE 1: inversion ------------------------------------------------
    if perform_inversion:
        ti_sched = lr_schedule(lr_scheduler, ti_lr, lr_warmup_steps, max_train_steps_ti)
        partition = TrainablePartition(unet_lora=False, text_lora=False, ti=True)
        optimizer = multi_group_optimizer(
            {"ti_embeddings": ParamGroup(
                lr=ti_lr, schedule=lr_scheduler, warmup_steps=lr_warmup_steps,
                total_steps=max_train_steps_ti, weight_decay=weight_decay_ti,
                step_multiplier=gradient_accumulation_steps,
            )},
            grad_accum_steps=gradient_accumulation_steps,
            use_8bit=use_8bit_adam,
        )
        state = run_phase(
            partition, optimizer, max_train_steps_ti, "step_inv_{}.safetensors",
            t_mutliplier=1.0, ti_sched=ti_sched, label="inversion",
            accum=gradient_accumulation_steps,
        )
        # carry the inverted embeddings into phase 2
        pipe.text_params = {
            **pipe.text_params,
            "token_embedding": {
                "embedding": jnp.asarray(state["params"]["ti_embeddings"])
            },
        }

    # ---- PHASE 2: LoRA tuning ---------------------------------------------
    rng, key = jax.random.split(rng)
    pipe.unet_lora = lora_lib.inject_trainable_lora(
        unet_targets, key, r=lora_rank, dtype=jnp.float32
    )
    print("Before training:")
    print(lora_lib.inspect_lora(pipe.unet_lora))

    groups = {
        "unet_lora": ParamGroup(
            lr=unet_lr, schedule=lr_scheduler_lora,
            warmup_steps=lr_warmup_steps_lora, total_steps=max_train_steps_tuning,
            weight_decay=weight_decay_lora,
        )
    }
    partition2 = TrainablePartition(
        unet_lora=True,
        text_lora=train_text_encoder,
        ti=continue_inversion,
        ti_constrained=False,
    )
    if continue_inversion:
        groups["ti_embeddings"] = ParamGroup(
            lr=continue_inversion_lr if continue_inversion_lr is not None else ti_lr,
            schedule="constant", weight_decay=weight_decay_lora,
        )
    if train_text_encoder:
        rng, key = jax.random.split(rng)
        pipe.text_encoder_lora = lora_lib.inject_trainable_lora(
            text_targets, key, r=lora_rank, dtype=jnp.float32
        )
        groups["text_lora"] = ParamGroup(
            lr=text_encoder_lr, schedule=lr_scheduler_lora,
            warmup_steps=lr_warmup_steps_lora, total_steps=max_train_steps_tuning,
            weight_decay=weight_decay_lora,
        )
        print(lora_lib.inspect_lora(pipe.text_encoder_lora))

    optimizer2 = multi_group_optimizer(
        groups, max_grad_norm=1.0, use_8bit=use_8bit_adam
    )
    train_dataset.blur_amount = 70

    state = run_phase(
        partition2, optimizer2, max_train_steps_tuning, "step_{}.safetensors",
        t_mutliplier=0.8, ti_sched=None, label="tuning",
    )

    # hand final trees back to the pipe for immediate inference use
    pipe.unet_lora = state["params"]["unet_lora"]
    if train_text_encoder:
        pipe.text_encoder_lora = state["params"]["text_lora"]
    if continue_inversion:
        pipe.text_params = {
            **pipe.text_params,
            "token_embedding": {
                "embedding": jnp.asarray(state["params"]["ti_embeddings"])
            },
        }
    return pipe


def main():
    Fire(train)


if __name__ == "__main__":
    main()
