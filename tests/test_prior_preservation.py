"""Prior-preservation class-image synthesis + json save + PTI wandb-less
eval-path guards."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "training_scripts"))

from diffusion_finetuning_tpu import lora as L
from diffusion_finetuning_tpu.io import torch_pickle


def test_class_image_synthesis_and_prior_training(tmp_path):
    import train_lora_dreambooth as db
    from tests.test_cli_tools import _tiny_pipe, _write_tokenizer
    from diffusion_finetuning_tpu.models import hf_export
    from PIL import Image

    pipe = _tiny_pipe()
    model_dir = str(tmp_path / "model")
    hf_export.save_pretrained(pipe, model_dir)
    _write_tokenizer(pipe.tokenizer, os.path.join(model_dir, "tokenizer"))

    inst = tmp_path / "inst"
    inst.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(inst / "a.png")
    class_dir = tmp_path / "classes"

    out = str(tmp_path / "out")
    args = db.parse_args([
        "--pretrained_model_name_or_path", model_dir,
        "--instance_data_dir", str(inst),
        "--instance_prompt", "a photo of sks",
        "--class_data_dir", str(class_dir),
        "--class_prompt", "a photo",
        "--with_prior_preservation",
        # batch-1 2-step 16x16 generation: the same executable the pipeline
        # tests trace (shared via the config-keyed pipeline exec cache)
        "--class_image_inference_steps", "2",
        "--num_class_images", "2",
        "--sample_batch_size", "1",
        "--output_dir", out,
        "--resolution", "16",
        "--train_batch_size", "1",
        "--max_train_steps", "2",
        "--save_steps", "0",
        "--lora_rank", "1",
        "--output_format", "pt",
        "--seed", "3",
    ])
    db.main(args)

    # class images were synthesized with sha1-suffixed names
    files = os.listdir(class_dir)
    assert len(files) == 2
    assert all("-" in f and f.endswith(".jpg") for f in files)
    # training with the doubled prior batch completed and saved
    assert os.path.exists(os.path.join(out, "lora_weight.pt"))

    # re-run synthesis: shortfall is zero, nothing new generated
    db.synthesize_class_images(args, _tiny_pipe())
    assert len(os.listdir(class_dir)) == 2


def test_save_lora_as_json(tmp_path):
    import json

    import jax

    from tests.test_cli_tools import _tiny_pipe

    pipe = _tiny_pipe()
    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(0), r=2)
    path = str(tmp_path / "w.json")
    L.save_lora_as_json(tree, targets, path)
    with open(path) as f:
        data = json.load(f)
    assert len(data) == 2 * len(targets)
    assert np.asarray(data[1]).shape == (2, targets[0].in_features)
