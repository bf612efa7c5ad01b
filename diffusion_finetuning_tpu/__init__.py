"""diffusion_finetuning_tpu — TPU-native LoRA fine-tuning for Stable Diffusion.

A from-scratch JAX/XLA/Pallas rebuild of the ``lora_diffusion`` stack
(cloneofsimo/lora lineage): LoRA injection/merging/serialization, DreamBooth
and Pivotal-Tuning-Inversion training, textual inversion, SVD distillation,
and txt2img/img2img inference — designed for TPU (SPMD meshes, fused Pallas
kernels, jit-compiled denoise/train loops) while reading and writing the
reference's exact ``.safetensors``/``.pt`` checkpoint formats.

The public surface mirrors ``lora_diffusion/__init__.py`` in the reference.
"""

import os as _os

# DFT_PLATFORM=cpu|tpu forces the JAX platform at import time.  Needed
# because some TPU plugins (the axon tunnel here) ignore the standard
# ``JAX_PLATFORMS`` env var — programmatic config is the only reliable
# switch, and CLI users can't call jax.config themselves before the
# package initializes a backend.
if _os.environ.get("DFT_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["DFT_PLATFORM"])

from .lora import *  # noqa: F401,F403
from .lora import (  # explicit re-exports for static analyzers
    DEFAULT_TARGET_REPLACE,
    EMBED_FLAG,
    TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    UNET_DEFAULT_TARGET_REPLACE,
    LoraTarget,
)

# The reference package also re-exports the dataset and eval surfaces
# (lora_diffusion/__init__.py:2-3) and the pipeline helpers; these pull in
# flax/PIL, so they resolve lazily (PEP 562) to keep `import
# diffusion_finetuning_tpu` light for serialization-only users.
_LAZY = {
    "PivotalTuningDatasetCapation": ("diffusion_finetuning_tpu.data.dataset", None),
    "DreamBoothDataset": ("diffusion_finetuning_tpu.data.dataset", None),
    "DreamBoothTiDataset": ("diffusion_finetuning_tpu.data.dataset", None),
    "PromptDataset": ("diffusion_finetuning_tpu.data.dataset", None),
    "OBJECT_TEMPLATE": ("diffusion_finetuning_tpu.data.dataset", None),
    "STYLE_TEMPLATE": ("diffusion_finetuning_tpu.data.dataset", None),
    "DataLoader": ("diffusion_finetuning_tpu.data.dataset", None),
    "CLIPTokenizer": ("diffusion_finetuning_tpu.data.tokenizer", None),
    "StableDiffusionPipeline": ("diffusion_finetuning_tpu.pipelines.pipeline", None),
    "patch_pipe": ("diffusion_finetuning_tpu.pipelines.pipeline", None),
    "tune_lora_scale_pipe": ("diffusion_finetuning_tpu.pipelines.pipeline", None),
    "apply_learned_embed_in_clip": ("diffusion_finetuning_tpu.pipelines.pipeline", None),
    "load_learned_embed_in_clip": ("diffusion_finetuning_tpu.pipelines.pipeline", None),
    "EXAMPLE_PROMPTS": ("diffusion_finetuning_tpu.utils.eval", None),
    "image_grid": ("diffusion_finetuning_tpu.utils.eval", None),
    "text_img_alignment": ("diffusion_finetuning_tpu.utils.eval", None),
    "prepare_clip_model_sets": ("diffusion_finetuning_tpu.utils.eval", None),
    "evaluate_pipe": ("diffusion_finetuning_tpu.utils.eval", None),
    "visualize_progress": ("diffusion_finetuning_tpu.utils.eval", None),
    "convert_to_ckpt": ("diffusion_finetuning_tpu.to_ckpt_v2", None),
    "set_use_memory_efficient_attention_xformers": (
        "diffusion_finetuning_tpu.xformers_utils", None),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name][0])
        value = getattr(module, name)
        globals()[name] = value
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))


__version__ = "0.1.0"
