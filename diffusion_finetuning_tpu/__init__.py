"""diffusion_finetuning_tpu — TPU-native LoRA fine-tuning for Stable Diffusion.

A from-scratch JAX/XLA/Pallas rebuild of the ``lora_diffusion`` stack
(cloneofsimo/lora lineage): LoRA injection/merging/serialization, DreamBooth
and Pivotal-Tuning-Inversion training, textual inversion, SVD distillation,
and txt2img/img2img inference — designed for TPU (SPMD meshes, fused Pallas
kernels, jit-compiled denoise/train loops) while reading and writing the
reference's exact ``.safetensors``/``.pt`` checkpoint formats.

The public surface mirrors ``lora_diffusion/__init__.py`` in the reference.
"""

from .lora import *  # noqa: F401,F403
from .lora import (  # explicit re-exports for static analyzers
    DEFAULT_TARGET_REPLACE,
    EMBED_FLAG,
    TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    UNET_DEFAULT_TARGET_REPLACE,
    LoraTarget,
)

__version__ = "0.1.0"
