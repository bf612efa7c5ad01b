"""uint8 pixel wire format: lossless requantization + collate plumbing.

Host→device pixel transfer dominates tunneled-TPU training wall time
(~570 ms per 10-step fp32 batch stack vs a 415 ms device dispatch —
PARITY.md round-3 ledger); the DataLoader ships uint8 by default and the
train step normalizes on device.  These tests pin the losslessness contract
(requantize → renormalize is the identity on every to_normalized_array
output) and the automatic fp32 fallback for off-grid float datasets.
The end-to-end bit-identity of the uint8 training trajectory is covered in
tests/test_multi_step.py::test_uint8_batch_matches_float_batch.
"""

import numpy as np

from diffusion_finetuning_tpu.data.dataset import (
    collate_batch, requantize_uint8, to_normalized_array,
)


def _examples(px):
    return [{"instance_prompt_ids": [0, 1, 2], "instance_images": p}
            for p in px]


def test_requantize_roundtrips_every_uint8_value():
    from PIL import Image

    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16)
    u8 = np.stack([u8, u8.T, u8[::-1]], axis=-1)
    f32 = to_normalized_array(Image.fromarray(u8))
    back = requantize_uint8(f32)
    np.testing.assert_array_equal(back, u8)


def test_requantize_rejects_offgrid_floats():
    arr = np.full((4, 4, 3), 0.1234, np.float32)  # not on the u8 grid
    assert requantize_uint8(arr) is None


def test_collate_uint8_format_and_fallback(capsys):
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 8, 8, 3), np.uint8)
    f32 = u8.astype(np.float32) / 255.0 * 2.0 - 1.0

    batch = collate_batch(_examples(f32), pad_token_id=0,
                          pixel_format="uint8")
    assert batch["pixel_values"].dtype == np.uint8
    np.testing.assert_array_equal(batch["pixel_values"], u8)

    # default stays fp32 (public collate contract unchanged)
    batch = collate_batch(_examples(f32), pad_token_id=0)
    assert batch["pixel_values"].dtype == np.float32

    # off-grid floats fall back to fp32 with a one-time warning
    import diffusion_finetuning_tpu.data.dataset as ds
    ds._warned_unquantized = False
    off = np.full((1, 8, 8, 3), 0.1234, np.float32)
    batch = collate_batch(_examples(off), pad_token_id=0,
                          pixel_format="uint8")
    assert batch["pixel_values"].dtype == np.float32
    assert "falling back to float32" in capsys.readouterr().out


def test_collate_mask_requantizes_too():
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (1, 8, 8, 3), np.uint8)
    f32 = u8.astype(np.float32) / 255.0 * 2.0 - 1.0
    mask_u8 = rng.integers(0, 256, (8, 8, 1), np.uint8)
    ex = [{"instance_prompt_ids": [0], "instance_images": f32[0],
           "mask": mask_u8.astype(np.float32) / 255.0}]
    batch = collate_batch(ex, pad_token_id=0, pixel_format="uint8")
    assert batch["mask"].dtype == np.uint8
    np.testing.assert_array_equal(batch["mask"][0], mask_u8)
    # fp32 default keeps masks float
    batch = collate_batch(ex, pad_token_id=0)
    assert batch["mask"].dtype == np.float32


def test_dataloader_emits_uint8_by_default(tmp_path):
    from PIL import Image

    from diffusion_finetuning_tpu.data.dataset import (
        DataLoader, PivotalTuningDatasetCapation,
    )
    from diffusion_finetuning_tpu.data.tokenizer import CLIPTokenizer

    rng = np.random.default_rng(1)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 256, (16, 16, 3), np.uint8)).save(
            tmp_path / f"img_{i}.png")
    tok = CLIPTokenizer.tiny(["photo", "of", "sks"])
    dset = PivotalTuningDatasetCapation(
        str(tmp_path), tokenizer=tok, token_map={"SKS": "sks"},
        use_template="object", size=16, h_flip=False, seed=0,
    )
    dl = DataLoader(dset, 2, pad_token_id=0, prefetch=0)
    batch = next(iter(dl))
    assert batch["pixel_values"].dtype == np.uint8
    dl = DataLoader(dset, 2, pad_token_id=0, prefetch=0,
                    pixel_format="float32")
    assert next(iter(dl))["pixel_values"].dtype == np.float32
