"""End-to-end smoke tests for the joint staged TI→LoRA trainers
(train_lora_w_ti / train_lora_pt_caption), incl. fused dispatch."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "training_scripts"))

from diffusion_finetuning_tpu import lora as L
from diffusion_finetuning_tpu.io import torch_pickle


def _setup(tmp_path, fname="img0.png"):
    from tests.test_cli_tools import _tiny_pipe, _write_tokenizer
    from diffusion_finetuning_tpu.models import hf_export
    from PIL import Image

    pipe = _tiny_pipe()
    model_dir = str(tmp_path / "model")
    hf_export.save_pretrained(pipe, model_dir)
    _write_tokenizer(pipe.tokenizer, os.path.join(model_dir, "tokenizer"))
    inst = tmp_path / "inst"
    inst.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8)).save(
        inst / fname)
    return pipe, model_dir, str(inst)


def test_w_ti_staged_end_to_end(tmp_path):
    """Staged schedule: steps < unfreeze train TI only; after, LoRA only
    (reference train_lora_w_ti.py:988-994).  Runs with fused dispatch."""
    import train_lora_w_ti as w_ti

    pipe, model_dir, inst = _setup(tmp_path)
    out = str(tmp_path / "out")
    args = w_ti.parse_args([
        "--pretrained_model_name_or_path", model_dir,
        "--instance_data_dir", inst,
        "--placeholder_token", "<krk>",
        "--initializer_token", "photo",
        "--output_dir", out,
        "--resolution", "16",
        "--train_batch_size", "1",
        "--max_train_steps", "4",
        "--unfreeze_lora_step", "2",
        "--save_steps", "0",
        "--lora_rank", "1",
        "--learning_rate", "1e-3",
        "--learning_rate_ti", "1e-2",
        "--lr_scheduler", "constant",
        "--lr_warmup_steps", "0",
        "--output_format", "both",
        "--seed", "3",
        "--steps_per_dispatch", "2",
        # exercise the override loaders (same content as the base model)
        "--tokenizer_name", os.path.join(model_dir, "tokenizer"),
        "--pretrained_vae_name_or_path", os.path.join(model_dir, "vae"),
    ])
    state = w_ti.main(args)
    assert int(np.asarray(state["step"])) == 4

    # LoRA moved during the unfrozen phase
    moved = [v for vals in L.inspect_lora(
        state["params"]["unet_lora"]).values() for v in vals]
    assert max(moved) > 0
    # outputs: .pt pair + .ti.pt sidecar + consolidated safetensors
    flat = torch_pickle.load(os.path.join(out, "lora_weight.pt"))
    assert len(flat) > 0
    ti = torch_pickle.load(os.path.join(out, "lora_weight.ti.pt"))
    assert set(ti) == {"<krk>"}
    assert os.path.exists(os.path.join(out, "lora_weight.safetensors"))
    assert os.path.exists(os.path.join(out, "lora_weight.text_encoder.pt"))
    # tensorboard event files under --logging_dir (reference logs loss/lr
    # per step via accelerator.log, train_lora_w_ti.py:645, 1161)
    logdir = os.path.join(out, args.logging_dir)
    assert any(f.startswith("events") for f in os.listdir(logdir))


def test_pt_caption_end_to_end(tmp_path):
    """Caption variant: filename-stem captions, pt-only saves
    (reference train_lora_pt_caption.py:137-145, 1059-1065)."""
    import train_lora_pt_caption as ptc

    pipe, model_dir, inst = _setup(tmp_path, fname="a photo of sks.png")
    out = str(tmp_path / "out")
    class_dir = str(tmp_path / "classes")
    args = ptc.parse_args([
        # prior preservation synthesizes missing class images (reference
        # train_lora_w_ti.py:671-688) then doubles the batch
        "--with_prior_preservation",
        # 2 steps / batch 1 / 16x16 = the same generation executable the
        # pipeline tests and the prior-preservation test trace (the pipeline
        # exec cache keys on configs, pipelines/pipeline.py:263)
        "--class_image_inference_steps", "2",
        "--class_data_dir", class_dir,
        "--class_prompt", "a photo",
        "--num_class_images", "1",
        "--sample_batch_size", "1",
        "--pretrained_model_name_or_path", model_dir,
        "--instance_data_dir", inst,
        "--placeholder_token", "<krk>",
        "--initializer_token", "photo",
        "--output_dir", out,
        "--resolution", "16",
        "--train_batch_size", "1",
        "--max_train_steps", "4",   # two full fused groups (the tail
        "--unfreeze_lora_step", "2",  # fallback is covered in test_multi_step)
        "--save_steps", "0",
        "--lora_rank", "1",
        "--seed", "5",
        "--steps_per_dispatch", "2",
    ])
    assert args.output_format == "pt"
    state = ptc.main(args)
    assert int(np.asarray(state["step"])) == 4
    assert os.path.exists(os.path.join(out, "lora_weight.pt"))
    assert os.path.exists(os.path.join(out, "lora_weight.ti.pt"))
    # pt-only: no safetensors written
    assert not os.path.exists(os.path.join(out, "lora_weight.safetensors"))
    # class image was synthesized with a sha1-suffixed name
    assert len(os.listdir(class_dir)) == 1
    # tensorboard events appear for the caption variant too
    assert any(f.startswith("events")
               for f in os.listdir(os.path.join(out, args.logging_dir)))
