"""Training-progress visualization (the reference's
scripts/lora_training_process_visualized.ipynb workflow): patch each
checkpoint matching a glob into the pipeline, render a fixed seed, and save
a progress grid.

Usage:
    python scripts/visualize_training_progress.py MODEL_DIR "out/step_*.safetensors" \
        progress.png --prompt "a photo of <s1>"
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusion_finetuning_tpu.utils.cli import Fire
from diffusion_finetuning_tpu.utils.eval import image_grid, visualize_progress


def run(model_dir: str, checkpoints_glob: str, out_path: str = "progress.png",
        prompt: str = "a photo of <s1>", steps: int = 50,
        guidance_scale: float = 5.0, seed: int = 0,
        unet_scale: float = 1.0, text_scale: float = 1.0, limit: int = 10):
    imgs = visualize_progress(
        checkpoints_glob, prompt, model_dir,
        num_inference_steps=steps, guidance_scale=guidance_scale, seed=seed,
        unet_scale=unet_scale, text_sclae=text_scale, limit=limit,
    )
    image_grid(imgs, rows=1, cols=len(imgs)).save(out_path)
    print(f"wrote {out_path} ({len(imgs)} checkpoints)")


if __name__ == "__main__":
    Fire(run)
