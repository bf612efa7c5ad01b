"""Schema parity tests against the reference golden safetensors artifact."""

import json

import numpy as np
import pytest

from diffusion_finetuning_tpu.io import safetensors_io as st

GOLDEN = "/root/reference/example_loras/lora_disney.safetensors"


def test_parse_golden_file():
    tensors, metadata = st.read_safetensors(GOLDEN)
    loras = st.parse_safeloras(tensors, metadata)
    assert set(loras) == {"unet", "text_encoder"}
    unet_w, unet_r, unet_t = loras["unet"]
    assert len(unet_w) == 288 and len(unet_r) == 144
    assert all(r == 1 for r in unet_r)
    assert set(unet_t) == {"CrossAttention", "Attention", "GEGLU"}
    te_w, te_r, te_t = loras["text_encoder"]
    assert len(te_w) == 96 and all(r == 1 for r in te_r)
    assert te_t == ["CLIPAttention"]
    # up before down within each pair; shapes consistent with rank metadata
    for i in range(144):
        up, down = unet_w[2 * i], unet_w[2 * i + 1]
        assert up.shape[1] == 1 and down.shape[0] == 1


def test_parse_golden_embeds():
    tensors, metadata = st.read_safetensors(GOLDEN)
    embeds = st.parse_safeloras_embeds(tensors, metadata)
    assert set(embeds) == {"<s1>", "<s2>"}
    assert embeds["<s1>"].shape == (768,)


def test_write_parse_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    flat = []
    ranks = []
    for _ in range(3):
        r = int(rng.integers(1, 5))
        flat += [rng.normal(size=(32, r)).astype(np.float16),
                 rng.normal(size=(r, 16)).astype(np.float16)]
        ranks.append(r)
    embeds = {"<tok>": rng.normal(size=(768,)).astype(np.float32)}
    p = str(tmp_path / "rt.safetensors")
    st.write_safeloras(
        {"unet": (flat, ranks, ["CrossAttention", "Attention", "GEGLU"])},
        p, embeds=embeds,
    )
    loras = st.load_safeloras(p)
    w, r, t = loras["unet"]
    assert r == ranks
    for a, b in zip(flat, w):
        np.testing.assert_array_equal(a, b)
    emb = st.load_safeloras_embeds(p)
    np.testing.assert_array_equal(emb["<tok>"], embeds["<tok>"])


def test_written_metadata_matches_reference_schema(tmp_path):
    """Keys/metadata must follow lora.py:243-255 exactly so reference-side
    tooling can read our files."""
    flat = [np.ones((8, 2), np.float16), np.ones((2, 4), np.float16)]
    p = str(tmp_path / "m.safetensors")
    st.write_safeloras({"text_encoder": (flat, [2], ["CLIPAttention"])}, p,
                       embeds={"<s1>": np.zeros(768, np.float32)})
    tensors, metadata = st.read_safetensors(p)
    assert set(tensors) == {"text_encoder:0:up", "text_encoder:0:down", "<s1>"}
    assert json.loads(metadata["text_encoder"]) == ["CLIPAttention"]
    assert metadata["text_encoder:0:rank"] == "2"
    assert metadata["<s1>"] == st.EMBED_FLAG


def test_pure_fallback_matches_lib(tmp_path):
    """The numpy fallback reader/writer agrees with the safetensors lib."""
    tensors = {"a:0:up": np.random.randn(4, 2).astype(np.float32),
               "a:0:down": np.random.randn(2, 3).astype(np.float16)}
    meta = {"a": json.dumps(["X"]), "a:0:rank": "2"}
    p1 = str(tmp_path / "lib.safetensors")
    st.write_safetensors(tensors, p1, meta)
    t2, m2 = st._pure_read(p1)
    assert m2 == meta
    for k in tensors:
        np.testing.assert_array_equal(tensors[k], t2[k])
    p2 = str(tmp_path / "pure.safetensors")
    st._pure_write(tensors, meta, p2)
    t3, m3 = st.read_safetensors(p2)
    assert m3 == meta
    for k in tensors:
        np.testing.assert_array_equal(tensors[k], t3[k])


def test_golden_roundtrip_bit_identical(tmp_path):
    """parse → write_safeloras must reproduce the golden file BYTE-for-byte
    (reference writer schema lora.py:228-265 + the safetensors encoding
    conventions of the build that produced it: sorted keys, sorted
    metadata, compact JSON, unpadded header)."""
    tensors, metadata = st.read_safetensors(GOLDEN)
    loras = st.parse_safeloras(tensors, metadata)
    embeds = st.parse_safeloras_embeds(tensors, metadata)
    p = str(tmp_path / "rt.safetensors")
    st.write_safeloras(loras, p, embeds=embeds)
    with open(GOLDEN, "rb") as f:
        want = f.read()
    with open(p, "rb") as f:
        got = f.read()
    assert got == want


def test_safetensors_lib_reads_canonical_output(tmp_path):
    """The installed safetensors lib must read our canonical (unpadded)
    writer output — interop with reference-side tooling."""
    import safetensors

    tensors = {"m:0:up": np.ones((4, 2), np.float32),
               "m:0:down": np.ones((2, 3), np.float32)}
    meta = {"m": json.dumps(["X"]), "m:0:rank": "2"}
    p = str(tmp_path / "c.safetensors")
    st.write_safetensors(tensors, p, meta)
    with safetensors.safe_open(p, framework="numpy") as f:
        assert set(f.keys()) == set(tensors)
        assert f.metadata() == meta
        np.testing.assert_array_equal(f.get_tensor("m:0:up"), tensors["m:0:up"])


def test_malformed_safelora_diagnostics():
    """Missing rank metadata / missing pair tensor raise descriptive
    ValueErrors, not bare KeyErrors."""
    import numpy as np
    import pytest
    from diffusion_finetuning_tpu.io import safetensors_io as sio

    tensors = {"unet:0:up": np.zeros((4, 1), np.float32),
               "unet:0:down": np.zeros((1, 4), np.float32)}
    meta = {"unet": "[\"CrossAttention\"]"}  # no unet:0:rank
    with pytest.raises(ValueError, match="rank"):
        sio.parse_safeloras(tensors, meta)
    meta["unet:0:rank"] = "1"
    del tensors["unet:0:down"]
    with pytest.raises(ValueError, match="missing"):
        sio.parse_safeloras(tensors, meta)
