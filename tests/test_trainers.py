"""End-to-end smoke tests for the PTI trainer on tiny CPU models."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from diffusion_finetuning_tpu import lora as L
from diffusion_finetuning_tpu.io import safetensors_io


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from tests.test_cli_tools import _tiny_pipe, _write_tokenizer
    from diffusion_finetuning_tpu.models import hf_export

    pipe = _tiny_pipe()
    d = str(tmp_path_factory.mktemp("sd_tiny_train"))
    hf_export.save_pretrained(pipe, d)
    _write_tokenizer(pipe.tokenizer, os.path.join(d, "tokenizer"))
    return d


@pytest.fixture(scope="module")
def instance_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"a photo of sks_{i}.png")
    return str(d)


def test_lora_pti_end_to_end(tiny_model_dir, instance_dir, tmp_path):
    from diffusion_finetuning_tpu.cli_lora_pti import train

    out = str(tmp_path / "out")
    pipe = train(
        instance_data_dir=instance_dir,
        pretrained_model_name_or_path=tiny_model_dir,
        output_dir=out,
        use_template="object",
        placeholder_tokens="<s1>|<s2>",
        initializer_tokens="<rand-0.5>|<zero>",
        seed=7,
        resolution=16,
        train_batch_size=1,
        max_train_steps_ti=4,
        max_train_steps_tuning=4,
        save_steps=2,
        gradient_accumulation_steps=2,
        lora_rank=2,
        train_text_encoder=True,
        continue_inversion=True,
        color_jitter=False,
        mixed_precision="no",
        steps_per_dispatch=2,  # fused-dispatch path; save cadence unchanged
    )

    # phase-1 TI checkpoints exist and contain only embeds
    inv = os.path.join(out, "step_inv_2.safetensors")
    assert os.path.exists(inv)
    tensors, metadata = safetensors_io.read_safetensors(inv)
    embeds = L.parse_safeloras_embeds(tensors, metadata)
    assert set(embeds) == {"<s1>", "<s2>"}
    assert not L.parse_safeloras(tensors, metadata)

    # phase-2 checkpoints contain unet + text LoRA + embeds
    tuned = os.path.join(out, "step_4.safetensors")
    assert os.path.exists(tuned)
    tensors, metadata = safetensors_io.read_safetensors(tuned)
    loras = L.parse_safeloras(tensors, metadata)
    assert set(loras) == {"unet", "text_encoder"}
    flat, ranks, target = loras["unet"]
    assert all(r == 2 for r in ranks)
    embeds = L.parse_safeloras_embeds(tensors, metadata)
    assert set(embeds) == {"<s1>", "<s2>"}

    # LoRA actually moved (ups start at zero; grads must flow)
    moved = [v for vals in L.inspect_lora(pipe.unet_lora).values() for v in vals]
    assert max(moved) > 0.0

    # the returned pipe is immediately usable for patched inference
    imgs = pipe("a photo of <s1> <s2>", num_inference_steps=2, height=16,
                width=16, output_type="np")
    assert imgs.shape == (1, 16, 16, 3)


def test_pti_ti_rows_frozen(tiny_model_dir, instance_dir, tmp_path):
    """Phase 1 must only move the placeholder rows.  Runs with save_steps=0
    ("never save periodically" — the reference crashes on 0,
    cli_lora_pti.py:359) to pin that both phases train to completion."""
    from diffusion_finetuning_tpu.cli_lora_pti import get_models, train

    out = str(tmp_path / "out2")
    pipe0, ids = get_models(tiny_model_dir, None, None, ["<x>"], ["<zero>"])
    before = np.asarray(pipe0.text_params["token_embedding"]["embedding"])

    pipe = train(
        instance_data_dir=instance_dir,
        pretrained_model_name_or_path=tiny_model_dir,
        output_dir=out,
        use_template="object",
        placeholder_tokens="<x>",
        initializer_tokens="<zero>",
        seed=3,
        resolution=16,
        max_train_steps_ti=2,
        max_train_steps_tuning=1,
        save_steps=0,
        gradient_accumulation_steps=1,
        lora_rank=2,
        continue_inversion=False,
        color_jitter=False,
        mixed_precision="no",
    )
    after = np.asarray(pipe.text_params["token_embedding"]["embedding"])
    tid = ids[0]
    frozen = np.delete(np.arange(after.shape[0]), tid)
    np.testing.assert_array_equal(after[frozen], before[frozen])
    assert np.abs(after[tid]).max() > 0  # placeholder row trained
