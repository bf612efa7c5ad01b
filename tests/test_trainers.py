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


def _checkpoint_embedding(tiny_model_dir):
    from diffusion_finetuning_tpu.models import hf_loading

    tdir = os.path.join(tiny_model_dir, "text_encoder")
    return np.asarray(hf_loading.params_from_hf_state_dict(
        hf_loading.load_model_dir_state_dict(tdir),
        hf_loading.clip_config_from_hf(
            hf_loading.read_json(os.path.join(tdir, "config.json"))),
    )["token_embedding"]["embedding"])


def test_lora_pti_end_to_end(tiny_model_dir, instance_dir, tmp_path):
    from diffusion_finetuning_tpu.cli_lora_pti import train

    before = _checkpoint_embedding(tiny_model_dir)
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

    # With continue_inversion the embedding matrix trains through phase 2
    # exactly like the reference (perform_tuning has NO frozen-row restore,
    # reference cli_lora_pti.py:408-489): caption-token rows take real
    # optimizer steps and every row sees decoupled weight decay.  Bound the
    # non-placeholder movement by a few optimizer steps; the bit-exact
    # frozen-row invariant is pinned in the continue_inversion=False test
    # below.
    after = np.asarray(pipe.text_params["token_embedding"]["embedding"])
    ids = [pipe.tokenizer.convert_tokens_to_ids(t) for t in ("<s1>", "<s2>")]
    frozen = np.delete(np.arange(before.shape[0]), ids)
    assert np.abs(after[frozen] - before[frozen]).max() < 5e-3
    # final in-memory rows == the step-4 checkpoint's saved embeds
    assert all(np.abs(after[t] - embeds[k]).max() == 0
               for t, k in zip(ids, ("<s1>", "<s2>")))
    assert np.abs(after[ids[0]]).max() > 0


def test_pti_save_steps_zero_trains_to_completion(tiny_model_dir, instance_dir,
                                                  tmp_path):
    """save_steps=0 = never save periodically (the reference crashes on 0,
    cli_lora_pti.py:359): both phases must run to completion and write no
    periodic checkpoints.  Also pins the bit-exact frozen-row invariant:
    without continue_inversion, phase 1 restores every non-placeholder row
    (reference cli_lora_pti.py:338-346) and phase 2 never touches TI."""
    from diffusion_finetuning_tpu.cli_lora_pti import train

    before = _checkpoint_embedding(tiny_model_dir)
    out = str(tmp_path / "out2")
    # phase-1 hyperparameters/shapes match the e2e test above on purpose:
    # the config-keyed executable caches (training/train_step.py) make the
    # repeat phase re-trace nothing, which is also what they exist for
    pipe = train(
        instance_data_dir=instance_dir,
        pretrained_model_name_or_path=tiny_model_dir,
        output_dir=out,
        use_template="object",
        placeholder_tokens="<x>|<y>",
        initializer_tokens="<zero>|<zero>",
        seed=3,
        resolution=16,
        train_batch_size=1,
        max_train_steps_ti=4,
        max_train_steps_tuning=1,
        save_steps=0,
        gradient_accumulation_steps=2,
        lora_rank=2,
        continue_inversion=False,
        color_jitter=False,
        mixed_precision="no",
        steps_per_dispatch=2,
    )
    assert not [f for f in os.listdir(out) if f.startswith("step_")]

    after = np.asarray(pipe.text_params["token_embedding"]["embedding"])
    tids = [pipe.tokenizer.convert_tokens_to_ids(t) for t in ("<x>", "<y>")]
    frozen = np.delete(np.arange(before.shape[0]), tids)
    np.testing.assert_array_equal(after[frozen], before[frozen])
