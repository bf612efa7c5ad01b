"""Face-segmentation mask parity (reference dataset.py:176-220, VERDICT r1
missing #3): a detector must actually run in this image (no mediapipe, no
ONNX weights, OpenCV 5 dropped Haar), no-face images must NOT silently train
with an all-ones mask, and the box -> 255-rect -> GaussianBlur -> resize
chain must match the reference's PIL semantics.
"""

import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFilter

from diffusion_finetuning_tpu.data import dataset as ds


@pytest.fixture
def face_image(tmp_path):
    """Synthetic frontal-portrait-like image the skin detector can find."""
    img = Image.new("RGB", (256, 256), (90, 120, 150))
    d = ImageDraw.Draw(img)
    d.ellipse([80, 60, 180, 190], fill=(224, 172, 140))
    for cx in (110, 150):
        d.ellipse([cx - 8, 100, cx + 8, 112], fill=(40, 30, 30))
    d.ellipse([115, 155, 145, 168], fill=(150, 75, 75))
    p = str(tmp_path / "face.png")
    img.save(p)
    return p


@pytest.fixture
def no_face_image(tmp_path):
    p = str(tmp_path / "wall.png")
    Image.new("RGB", (256, 256), (90, 120, 150)).save(p)
    return p


def test_detector_finds_synthetic_face(face_image):
    boxes, (h, w) = ds.detect_face_boxes(face_image)
    assert (h, w) == (256, 256)
    assert boxes, "no detector ran or it missed an obvious face"
    x, y, bw, bh = boxes[0]
    # box must cover the drawn oval's center (130, 125)
    assert x <= 130 <= x + bw and y <= 125 <= y + bh


def test_face_mask_nontrivial(face_image):
    m = ds.face_mask(face_image, 128, blur_amount=10)
    assert m.shape == (128, 128, 1)
    assert m[64, 64, 0] > 0.9  # face center kept
    assert m[4, 4, 0] < 0.1    # background masked out
    assert 0.05 < m.mean() < 0.6


def test_no_face_warns_and_zeros(no_face_image):
    """Reference draws rects on a zeros canvas — no detections leaves the
    mask black (dataset.py:182-206); we additionally warn loudly."""
    with pytest.warns(UserWarning, match="no face detected"):
        m = ds.face_mask(no_face_image, 64, blur_amount=10)
    assert m.max() == 0.0


def test_unreadable_image_warns_and_keeps_ones(tmp_path):
    p = str(tmp_path / "broken.png")
    with open(p, "wb") as f:
        f.write(b"not an image")
    with pytest.warns(UserWarning, match="could not read"):
        m = ds.face_mask(p, 32, blur_amount=4)
    assert m.min() == 1.0


def test_rect_blur_resize_chain_matches_reference(monkeypatch, tmp_path):
    """Golden chain test: with the detector pinned to a known box, the mask
    must equal the independently computed reference chain — 255-filled
    rectangle on zeros, PIL GaussianBlur(blur_amount), bilinear resize
    (reference dataset.py:197-216; square image so Resize==our
    resize+crop)."""
    H = W = 200
    box = (40, 30, 80, 100)  # x, y, w, h
    p = str(tmp_path / "img.png")
    Image.new("RGB", (W, H), (10, 10, 10)).save(p)
    monkeypatch.setattr(ds, "detect_face_boxes", lambda path: ([box], (H, W)))

    size, blur = 64, 7
    got = ds.face_mask(p, size, blur_amount=blur)

    canvas = np.zeros((H, W), np.uint8)
    x, y, bw, bh = box
    canvas[y:y + bh, x:x + bw] = 255
    want = Image.fromarray(canvas, mode="L").filter(
        ImageFilter.GaussianBlur(radius=blur)
    ).resize((size, size), Image.BILINEAR)
    want = (np.asarray(want, np.float32) / 255.0)[:, :, None]
    np.testing.assert_allclose(got, want, atol=1 / 255.0 + 1e-6)


def test_dataset_integration_mask_flows_to_batch(face_image, tmp_path):
    """use_face_segmentation_condition produces a mask entry that survives
    collation (reference train_lora_dreambooth.py mask-weighted loss)."""
    import shutil

    inst = tmp_path / "inst"
    inst.mkdir()
    shutil.copy(face_image, inst / "photo of sks person.png")

    from diffusion_finetuning_tpu.data.tokenizer import CLIPTokenizer

    tok = CLIPTokenizer.tiny(["photo", "of", "sks", "person"])
    d = ds.PivotalTuningDatasetCapation(
        instance_data_root=str(inst),
        tokenizer=tok,
        token_map={"sks": "sks"},
        size=64,
        use_face_segmentation_condition=True,
        blur_amount=10,
        h_flip=False,
    )
    ex = d[0]
    assert ex["mask"].shape == (64, 64, 1)
    assert ex["mask"].max() > 0.9
    batch = ds.collate_batch([ex, ex], pad_token_id=0)
    assert batch["mask"].shape == (2, 64, 64, 1)


def test_out_of_frame_box_does_not_wrap(monkeypatch, tmp_path):
    """A detection box fully above the frame (negative y, y+h <= 0) must
    mask NOTHING — a negative slice end would wrap and paint ~everything."""
    p = str(tmp_path / "img.png")
    Image.new("RGB", (100, 100), (10, 10, 10)).save(p)
    monkeypatch.setattr(
        ds, "detect_face_boxes",
        lambda path: ([(10, -60, 20, 50)], (100, 100)))
    m = ds.face_mask(p, 100, blur_amount=0)
    assert m.max() == 0.0  # box is entirely outside the image

    # partially-outside box: only the in-frame part masks
    monkeypatch.setattr(
        ds, "detect_face_boxes",
        lambda path: ([(10, -20, 20, 50)], (100, 100)))
    m = ds.face_mask(p, 100, blur_amount=0)
    assert m.max() == 1.0
    assert m[:30, 10:30].min() == 1.0   # rows 0..29 in frame
    assert m[31:, :].max() == 0.0
