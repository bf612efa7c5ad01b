"""``lora_distill`` — SVD-distill a full fine-tune into a rank-r LoRA.

TPU-native re-implementation of the reference CLI (cli_svd.py:29-115):
extract every LoRA-targetable linear weight from a tuned and a base
pipeline, compute per-matrix ``delta W = W_tuned - W_base``, truncate its
SVD at rank ``r`` folding the singular values into U, clamp both factors at
the signed ``clamp_quantile`` of the concatenated factor entries
(cli_svd.py:79-84 — the quantile is over signed values, the low clamp is
its negation), and save the flat ``.pt`` + ``.text_encoder.pt`` pair
loadable by ``monkeypatch_lora``.

The SVDs run per-matrix in fp32 numpy on the host (like the reference's
torch.svd loop, cli_svd.py:67-77); distillation is a one-off offline
conversion, not a serving path.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .io import torch_pickle
from .lora import (
    DEFAULT_TARGET_REPLACE,
    TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    LoraTarget,
    _text_lora_path,
)
from .tree_util import tree_get
from .utils.cli import Fire


def extract_linear_weights(params, targets: List[LoraTarget]) -> List[np.ndarray]:
    """Torch-layout (out, in) weights at each LoRA target, canonical order
    (reference cli_svd.py:19-26)."""
    return [
        np.asarray(tree_get(params, t.path)["kernel"], np.float32).T for t in targets
    ]


def _distill_one(delta: np.ndarray, rank: int, clamp_quantile: float):
    U, S, Vh = np.linalg.svd(delta.astype(np.float32), full_matrices=False)
    U = U[:, :rank] * S[:rank][None, :]
    Vh = Vh[:rank, :]
    dist = np.concatenate([U.flatten(), Vh.flatten()])
    hi_val = np.quantile(dist, clamp_quantile)
    low_val = -hi_val
    return np.clip(U, low_val, hi_val), np.clip(Vh, low_val, hi_val)


def svd_distill(
    target_model: str,
    base_model: str,
    rank: int = 4,
    clamp_quantile: float = 0.99,
    device: str = "tpu",
    save_path: str = "svd_distill.pt",
):
    del device  # placement is managed by JAX
    from .pipelines.pipeline import StableDiffusionPipeline

    pipe_base = StableDiffusionPipeline.from_pretrained(base_model)
    pipe_tuned = StableDiffusionPipeline.from_pretrained(target_model)

    unet_targets = pipe_base.lora_targets("unet", DEFAULT_TARGET_REPLACE)
    clip_targets = pipe_base.lora_targets(
        "text_encoder", TEXT_ENCODER_DEFAULT_TARGET_REPLACE
    )

    ori_unet = extract_linear_weights(pipe_base.unet_params, unet_targets)
    ori_clip = extract_linear_weights(pipe_base.text_params, clip_targets)
    tuned_unet = extract_linear_weights(pipe_tuned.unet_params, unet_targets)
    tuned_clip = extract_linear_weights(pipe_tuned.text_params, clip_targets)

    uds_unet: List[np.ndarray] = []
    uds_clip: List[np.ndarray] = []
    for ori, tuned in zip(ori_unet, tuned_unet):
        U, Vh = _distill_one(tuned - ori, rank, clamp_quantile)
        uds_unet += [U, Vh]
    for ori, tuned in zip(ori_clip, tuned_clip):
        U, Vh = _distill_one(tuned - ori, rank, clamp_quantile)
        uds_clip += [U, Vh]

    torch_pickle.save(uds_unet, save_path)
    torch_pickle.save(uds_clip, _text_lora_path(save_path))
    print(f"Saved {len(uds_unet) // 2} UNet and {len(uds_clip) // 2} CLIP "
          f"rank-{rank} pairs to {save_path}")


def main():
    Fire(svd_distill)


if __name__ == "__main__":
    main()
