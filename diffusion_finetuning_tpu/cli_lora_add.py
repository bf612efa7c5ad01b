"""``lora_add`` — merge two LoRAs, or merge a LoRA into a base model.

TPU-native re-implementation of the reference CLI
(cli_lora_add.py:17-118).  Modes:

* ``lpl``          — elementwise interpolation of two flat ``.pt`` LoRA
  lists: ``x <- alpha * x1 + (1 - alpha) * x2`` for both up and down of each
  pair (cli_lora_add.py:49-58), with optional ``.text_encoder.pt`` sidecars.
* ``upl``          — load a base diffusers pipeline, permanently merge the
  LoRA into the UNet (+ text encoder) weights, write a diffusers directory
  (cli_lora_add.py:72-88).
* ``upl-ckpt-v2``  — ``upl`` then convert to a single original-SD ``.ckpt``
  at fp16 (cli_lora_add.py:90-110).
"""

from __future__ import annotations

import os
import shutil

import numpy as np

from .io import torch_pickle
from .lora import (
    DEFAULT_TARGET_REPLACE,
    TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    _text_lora_path,
)
from .utils.cli import Fire


def _interpolate_flat(path_1: str, path_2: str, alpha: float):
    l1 = torch_pickle.load(path_1)
    l2 = torch_pickle.load(path_2)
    if len(l1) != len(l2):
        raise ValueError(
            f"cannot lpl-merge {path_1} ({len(l1)} tensors) with {path_2} "
            f"({len(l2)} tensors): different target sets (e.g. linear-only "
            "vs conv-extension, or unet vs text encoder)"
        )
    out = []
    for x1, x2 in zip(l1, l2):
        a1 = np.asarray(x1, np.float32)
        a2 = np.asarray(x2, np.float32)
        out.append((alpha * a1 + (1 - alpha) * a2).astype(np.asarray(x1).dtype))
    return out


def add(
    path_1: str,
    path_2: str,
    output_path: str,
    alpha: float = 0.5,
    mode: str = "lpl",
    with_text_lora: bool = False,
):
    print("Lora Add, mode " + mode)
    if mode == "lpl":
        for _path_1, _path_2, opt in [(path_1, path_2, "unet")] + (
            [(_text_lora_path(path_1), _text_lora_path(path_2), "text_encoder")]
            if with_text_lora
            else []
        ):
            print("Loading", _path_1, _path_2)
            if opt == "text_encoder":
                if not os.path.exists(_path_1):
                    print(f"No text encoder found in {_path_1}, skipping...")
                    continue
                if not os.path.exists(_path_2):
                    print(f"No text encoder found in {_path_2}, skipping...")
                    continue
            out_list = _interpolate_flat(_path_1, _path_2, alpha)
            if opt == "unet":
                print("Saving merged UNET to", output_path)
                torch_pickle.save(out_list, output_path)
            else:
                print("Saving merged text encoder to", _text_lora_path(output_path))
                torch_pickle.save(out_list, _text_lora_path(output_path))
        return

    if mode in ("upl", "upl-ckpt-v2"):
        from . import lora as lora_lib
        from .models import hf_export
        from .pipelines.pipeline import StableDiffusionPipeline

        print(f"Merging UNET/CLIP from {path_1} with LoRA from {path_2} to {output_path}. Merging ratio : {alpha}.")
        pipe = StableDiffusionPipeline.from_pretrained(path_1)

        unet_targets = pipe.lora_targets("unet", DEFAULT_TARGET_REPLACE)
        pipe.unet_params = lora_lib.weight_apply_lora(
            pipe.unet_params, path_2, unet_targets, alpha=alpha
        )
        if with_text_lora:
            text_path = _text_lora_path(path_2)
            if os.path.exists(text_path):
                text_targets = pipe.lora_targets(
                    "text_encoder", TEXT_ENCODER_DEFAULT_TARGET_REPLACE
                )
                pipe.text_params = lora_lib.weight_apply_lora(
                    pipe.text_params, text_path, text_targets, alpha=alpha
                )

        if mode == "upl":
            hf_export.save_pretrained(pipe, output_path, source_dir=path_1)
            return

        # upl-ckpt-v2: temp diffusers dir -> single .ckpt
        from .to_ckpt_v2 import convert_to_ckpt

        _tmp_output = output_path + ".tmp"
        hf_export.save_pretrained(pipe, _tmp_output, source_dir=path_1)
        convert_to_ckpt(_tmp_output, output_path, as_half=True)
        shutil.rmtree(_tmp_output)
        return

    raise ValueError(f"Unknown mode {mode}")


def main():
    Fire(add)


if __name__ == "__main__":
    main()
