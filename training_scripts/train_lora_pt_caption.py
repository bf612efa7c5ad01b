"""Joint LoRA + TI trainer with filename-stem captions.

Re-implements the reference ``training_scripts/train_lora_pt_caption.py``
(523-1072): identical staged TI-then-LoRA schedule as ``train_lora_w_ti``
(865-874) but each image's caption is its filename stem
(train_lora_pt_caption.py:137-145), and only ``.pt`` saves are produced
(1059-1065).

Implemented as a thin variant over :mod:`train_lora_w_ti`: same argparse
surface (minus the template flags) and the same jitted staged train step,
with the caption source swapped.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train_lora_w_ti as base

from diffusion_finetuning_tpu.data.dataset import PivotalTuningDatasetCapation


def parse_args(input_args=None):
    args = base.parse_args(input_args)
    args.output_format = "pt"  # reference pt_caption saves .pt only (1059-1065)
    return args


class _CaptionDataset(PivotalTuningDatasetCapation):
    """Filename-stem captions (train_lora_pt_caption.py:137-145); keeps the
    DreamBoothTiDataset transform surface."""

    def __init__(self, *, instance_data_root, placeholder_token,
                 stochastic_attribute, learnable_property, class_data_root,
                 class_prompt, tokenizer, size, center_crop, color_jitter,
                 resize, seed=None):
        del placeholder_token, stochastic_attribute, learnable_property, center_crop
        super().__init__(
            instance_data_root=instance_data_root,
            tokenizer=tokenizer,
            token_map=None,
            use_template=None,
            class_data_root=class_data_root,
            class_prompt=class_prompt,
            size=size,
            color_jitter=color_jitter,
            resize=resize,
            seed=seed,
        )


def main(args):
    return base.main(args, dataset_cls=_CaptionDataset)


if __name__ == "__main__":
    main(parse_args())
