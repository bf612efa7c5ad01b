"""Convert ``.pt`` LoRA / textual-inversion files to consolidated safetensors.

Re-implementation of the reference module CLI
(cli_pt_to_safetensors.py:19-85): each input path is auto-detected — a dict
is a TI embedding file, a list is a flat LoRA; the model name comes from the
filename (``foo.text_encoder.pt`` -> text_encoder, else unet); per-model
settings are passed as ``--unet.rank 8``-style prefixed flags.
"""

from __future__ import annotations

import os

from .io import torch_pickle
from .lora import (
    DEFAULT_TARGET_REPLACE,
    TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    UNET_DEFAULT_TARGET_REPLACE,
    convert_loras_to_safeloras_with_embeds,
)
from .utils.cli import Fire

_target_by_name = {
    "unet": UNET_DEFAULT_TARGET_REPLACE,
    "text_encoder": TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
}


def convert(*paths, outpath, overwrite=False, **settings):
    """Convert one or more pytorch LoRA and/or TI embedding files into one
    safetensors file.

    Model kind is auto-detected per file (dict => TI embeds, list => LoRA);
    the LoRA model name is taken from the path (``lora_weight.pt`` => unet,
    ``lora_weight.text_encoder.pt`` => text_encoder).  Set per-model
    target_modules/rank with name-prefixed flags, e.g.::

        python -m diffusion_finetuning_tpu.cli_pt_to_safetensors \\
            lora_weight.pt --outpath lora_weight.safetensors --unet.rank 8
    """
    modelmap = {}
    embeds = {}

    if os.path.exists(outpath) and not overwrite:
        raise ValueError(
            f"Output path {outpath} already exists, and overwrite is not True"
        )

    for path in paths:
        data = torch_pickle.load(path)

        if isinstance(data, dict):
            print(f"Loading textual inversion embeds {list(data.keys())} from {path}")
            embeds.update(data)
        else:
            name_parts = os.path.split(path)[1].split(".")
            name = name_parts[-2] if len(name_parts) > 2 else "unet"

            model_settings = {
                "target_modules": _target_by_name.get(name, DEFAULT_TARGET_REPLACE),
                "rank": 4,
            }
            prefix = f"{name}."
            model_settings.update(
                {k[len(prefix):]: v for k, v in settings.items() if k.startswith(prefix)}
            )
            print(f"Loading Lora for {name} from {path} with settings {model_settings}")
            modelmap[name] = (
                path,
                model_settings["target_modules"],
                model_settings["rank"],
            )

    convert_loras_to_safeloras_with_embeds(modelmap, embeds, outpath)


def main():
    Fire(convert)


if __name__ == "__main__":
    main()
