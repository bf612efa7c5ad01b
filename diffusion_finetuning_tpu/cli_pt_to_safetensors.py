"""Convert ``.pt`` LoRA / textual-inversion files to consolidated safetensors.

Behavior-parity re-implementation of the reference module CLI
(cli_pt_to_safetensors.py:19-85) without torch:

* each input file is auto-detected — a pickled dict is a TI embedding file,
  a pickled list is a flat LoRA;
* the LoRA model name derives from the filename
  (``foo.pt`` -> ``unet``, ``foo.text_encoder.pt`` -> ``text_encoder``);
* per-model settings arrive as name-prefixed flags, e.g. ``--unet.rank 8``
  or ``--text_encoder.target_modules "{'CLIPAttention'}"``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

from .io import torch_pickle
from .lora import (
    DEFAULT_TARGET_REPLACE,
    TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    UNET_DEFAULT_TARGET_REPLACE,
    convert_loras_to_safeloras_with_embeds,
)
from .utils.cli import Fire


def _model_name_for(path: str) -> str:
    """``lora_weight.text_encoder.pt`` -> text_encoder, else unet."""
    parts = os.path.basename(path).split(".")
    return parts[-2] if len(parts) > 2 else "unet"


def _default_targets(name: str) -> set:
    if name == "unet":
        return UNET_DEFAULT_TARGET_REPLACE
    if name == "text_encoder":
        return TEXT_ENCODER_DEFAULT_TARGET_REPLACE
    return DEFAULT_TARGET_REPLACE


def _settings_for(name: str, settings: Dict[str, Any]) -> Tuple[set, int]:
    opts = {"target_modules": _default_targets(name), "rank": 4}
    for key, value in settings.items():
        model, _, field = key.partition(".")
        if model == name and field:
            opts[field] = value
    return opts["target_modules"], opts["rank"]


def convert(*paths, outpath, overwrite=False, **settings):
    """Bundle one or more ``.pt`` LoRA / TI files into a single safetensors
    file (kind auto-detected per file; see module docstring for the
    name-prefixed per-model flags)."""
    if os.path.exists(outpath) and not overwrite:
        raise ValueError(
            f"Output path {outpath} already exists, and overwrite is not True"
        )

    modelmap: Dict[str, Tuple[str, set, int]] = {}
    embeds: Dict[str, Any] = {}
    for path in paths:
        payload = torch_pickle.load(path)
        if isinstance(payload, dict):
            print(f"Loading textual inversion embeds {list(payload)} from {path}")
            embeds.update(payload)
            continue
        name = _model_name_for(path)
        targets, rank = _settings_for(name, settings)
        print(f"Loading Lora for {name} from {path} "
              f"(rank {rank}, targets {sorted(targets)})")
        modelmap[name] = (path, targets, rank)

    convert_loras_to_safeloras_with_embeds(modelmap, embeds, outpath)


def main():
    Fire(convert)


if __name__ == "__main__":
    main()
