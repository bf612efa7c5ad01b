"""LoRA-patched img2img (the reference's scripts/run_img2img.ipynb
workflow): SDEdit-style image-to-image with a safetensors LoRA + TI tokens,
sweeping LoRA scales.

Usage:
    python scripts/run_img2img.py MODEL_DIR LORA_PATH init.png out.png \
        --prompt "style of <s1><s2>, portrait" [--strength 0.75]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
from PIL import Image

from diffusion_finetuning_tpu.pipelines.pipeline import (
    StableDiffusionPipeline,
    patch_pipe,
    tune_lora_scale_pipe,
)
from diffusion_finetuning_tpu.utils.cli import Fire


def run(model_dir: str, lora_path: str, init_image: str, out_path: str = "out.png",
        prompt: str = "a photo of <s1>", strength: float = 0.75,
        unet_scale: float = 1.0, text_scale: float = 1.0,
        steps: int = 50, guidance_scale: float = 7.5, seed: int = 0,
        scheduler: str = "ddim"):
    pipe = StableDiffusionPipeline.from_pretrained(model_dir, dtype=jnp.bfloat16)
    patch_pipe(pipe, lora_path, patch_unet=True, patch_text=True, patch_ti=True)
    tune_lora_scale_pipe(pipe, unet_scale, which="unet")
    tune_lora_scale_pipe(pipe, text_scale, which="text")

    init = np.asarray(Image.open(init_image).convert("RGB"))
    [img] = pipe.img2img(prompt, init, strength=strength,
                         num_inference_steps=steps, scheduler=scheduler,
                         guidance_scale=guidance_scale, seed=seed)
    img.save(out_path)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    Fire(run)
