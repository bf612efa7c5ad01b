"""Round-trip and cross-compat tests for the pure-Python torch .pt codec."""

import numpy as np
import pytest

from diffusion_finetuning_tpu.io import torch_pickle as tp

torch = pytest.importorskip("torch")

GOLDEN_PT = "/root/reference/example_loras/analog_svd_distill.text_encoder.pt"


def test_reads_reference_golden_pt():
    obj = tp.load(GOLDEN_PT)
    assert isinstance(obj, list)
    # 12 CLIP layers x 4 projections x (up, down) = 96 tensors, rank 4
    assert len(obj) == 96
    assert obj[0].shape == (768, 4)  # up
    assert obj[1].shape == (4, 768)  # down
    ref = torch.load(GOLDEN_PT, map_location="cpu", weights_only=False)
    for ours, theirs in zip(obj, ref):
        np.testing.assert_array_equal(np.asarray(ours, np.float32),
                                      theirs.float().numpy())


def test_save_readable_by_torch(tmp_path):
    data = {
        "weights": [np.random.randn(8, 4).astype(np.float16),
                    np.random.randn(4, 8).astype(np.float16)],
        "rank": 4,
        "alpha": 0.75,
        "name": "unet",
        "flag": True,
        "nothing": None,
    }
    p = tmp_path / "x.pt"
    tp.save(data, p)
    back = torch.load(p, map_location="cpu", weights_only=False)
    assert back["rank"] == 4 and back["alpha"] == 0.75
    assert back["name"] == "unet" and back["flag"] is True
    assert back["nothing"] is None
    for a, b in zip(data["weights"], back["weights"]):
        assert b.dtype == torch.float16
        np.testing.assert_array_equal(a, b.numpy())


def test_load_torch_saved(tmp_path):
    p = tmp_path / "y.pt"
    payload = {
        "f32": torch.randn(3, 5),
        "f16": torch.randn(7).half(),
        "i64": torch.arange(6).reshape(2, 3),
        "scalar": torch.tensor(3.5),
        "nested": {"a": [torch.ones(2, 2)], "b": (1, "two")},
    }
    torch.save(payload, p)
    ours = tp.load(p)
    np.testing.assert_allclose(ours["f32"], payload["f32"].numpy())
    np.testing.assert_allclose(ours["f16"], payload["f16"].numpy())
    np.testing.assert_array_equal(ours["i64"], payload["i64"].numpy())
    assert float(ours["scalar"]) == pytest.approx(3.5)
    np.testing.assert_array_equal(ours["nested"]["a"][0], np.ones((2, 2)))
    assert ours["nested"]["b"] == (1, "two")


def test_noncontiguous_and_bf16(tmp_path):
    p = tmp_path / "z.pt"
    t = torch.randn(6, 8)
    torch.save({"view": t[:, ::2], "bf16": torch.randn(4, 4).bfloat16()}, p)
    ours = tp.load(p)
    np.testing.assert_allclose(ours["view"], t[:, ::2].numpy())
    np.testing.assert_allclose(
        np.asarray(ours["bf16"], np.float32),
        torch.load(p, weights_only=False)["bf16"].float().numpy(),
    )


def test_roundtrip_self(tmp_path):
    p = tmp_path / "rt.pt"
    flat = [np.random.randn(16, 2).astype(np.float16),
            np.random.randn(2, 16).astype(np.float16)] * 3
    tp.save(flat, p)
    back = tp.load(p)
    assert len(back) == 6
    for a, b in zip(flat, back):
        np.testing.assert_array_equal(a, b)


def test_legacy_format_loads_real_values(tmp_path):
    """torch<1.6 sequential layout (written by REAL torch with
    _use_new_zipfile_serialization=False): storage bytes live AFTER the
    payload pickle; values must come back exactly (regression: the first
    implementation materialized tensors from empty buffers)."""
    torch = pytest.importorskip("torch")

    from diffusion_finetuning_tpu.io import torch_pickle as tp

    w = torch.arange(12, dtype=torch.float32).reshape(3, 4) * 0.5
    b = torch.tensor([1.5, -2.0], dtype=torch.float16)
    path = str(tmp_path / "legacy.pt")
    torch.save({"w": w, "b": b, "items": [w[1], 7]}, path,
               _use_new_zipfile_serialization=False)

    out = tp.load(path)
    np.testing.assert_array_equal(np.asarray(out["w"]),
                                  w.numpy())
    np.testing.assert_array_equal(np.asarray(out["b"]), b.numpy())
    np.testing.assert_array_equal(np.asarray(out["items"][0]), w[1].numpy())
    assert out["items"][1] == 7


def test_zip_without_data_pkl_raises_value_error(tmp_path):
    import zipfile
    p = str(tmp_path / "not_torch.zip")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("hello.txt", "hi")
    with pytest.raises(ValueError, match="data.pkl"):
        tp.load(p)
