"""Alpha-scale sweep -> GIF (the reference's scripts/make_alpha_gifs.ipynb
workflow): render the same seed at 50 LoRA scales in [0, 1) and assemble an
animated gif.

Usage:
    python scripts/make_alpha_gifs.py MODEL_DIR LORA_PATH out.gif \
        --prompt "style of <s1><s2>, baby lion" [--frames 50] [--steps 50]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from diffusion_finetuning_tpu.pipelines.pipeline import (
    StableDiffusionPipeline,
    patch_pipe,
    tune_lora_scale_pipe,
)
from diffusion_finetuning_tpu.utils.cli import Fire


def sweep(model_dir: str, lora_path: str, out_path: str = "out.gif",
          prompt: str = "a photo of <s1>", frames: int = 50, steps: int = 50,
          guidance_scale: float = 7.5, seed: int = 0, duration_ms: int = 100):
    pipe = StableDiffusionPipeline.from_pretrained(model_dir, dtype=jnp.bfloat16)
    patch_pipe(pipe, lora_path, patch_unet=True, patch_text=True, patch_ti=True)

    images = []
    for i in range(frames):
        alpha = i / frames
        tune_lora_scale_pipe(pipe, alpha)
        # same jit cache across the whole sweep: scale is an array leaf
        [img] = pipe(prompt, num_inference_steps=steps,
                     guidance_scale=guidance_scale, seed=seed)
        images.append(img)
        print(f"alpha={alpha:.2f} done")

    images[0].save(out_path, save_all=True, append_images=images[1:],
                   duration=duration_ms, loop=0)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    Fire(sweep)
