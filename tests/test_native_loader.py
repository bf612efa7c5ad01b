"""Native C++ data-loader: parity vs the PIL path, batch decode, fallback."""

import numpy as np
import pytest
from PIL import Image

from diffusion_finetuning_tpu.data import native_loader as nl
from diffusion_finetuning_tpu.data.dataset import (
    center_crop,
    load_transformed_image,
    resize_short_side,
    to_normalized_array,
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h) in enumerate([(97, 64), (64, 97), (64, 64)]):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        p = str(d / f"img{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        p = str(d / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


needs_native = pytest.mark.skipif(not nl.available(), reason="native lib not built")


@needs_native
def test_native_matches_pil(images):
    for p in images:
        ours = nl.load_image(p, 48)
        img = Image.open(p).convert("RGB")
        ref = to_normalized_array(center_crop(resize_short_side(img, 48), 48))
        assert ours.shape == (48, 48, 3)
        # within one uint8 quantization step of Pillow's resampling
        assert np.abs(ours - ref).max() <= 2.5 / 127.5


@needs_native
def test_native_batch_and_flip(images):
    batch = nl.load_batch(images, 32, flips=[True] * len(images), n_threads=4)
    assert batch.shape == (len(images), 32, 32, 3)
    single = nl.load_image(images[0], 32, flip=False)
    np.testing.assert_allclose(batch[0], single[:, ::-1], atol=1e-6)


def test_load_transformed_image_works_either_way(images):
    out = load_transformed_image(images[0], 40)
    assert out.shape == (40, 40, 3)
    assert out.dtype == np.float32
    assert -1.0 <= out.min() and out.max() <= 1.0


@needs_native
def test_native_missing_file_returns_none():
    assert nl.load_image("/nonexistent/zzz.png", 32) is None


def test_prefetch_loader_propagates_errors(tmp_path):
    """A corrupt image must raise in the training loop, not silently end."""
    import pytest as _pytest

    from diffusion_finetuning_tpu.data.dataset import DataLoader

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise OSError("corrupt image")

    dl = DataLoader(Broken(), 2, pad_token_id=0, prefetch=2)
    with _pytest.raises(OSError, match="corrupt image"):
        list(dl)


def test_prefetch_loader_early_abandon_no_hang():
    import threading
    import time

    from diffusion_finetuning_tpu.data.dataset import DataLoader

    class Slowish:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"instance_images": np.zeros((4, 4, 3), np.float32),
                    "instance_prompt_ids": [1, 2]}

    dl = DataLoader(Slowish(), 1, pad_token_id=0, prefetch=2)
    it = iter(dl)
    next(it)
    n_before = threading.active_count()
    it.close()  # abandon mid-epoch
    time.sleep(0.5)
    assert threading.active_count() <= n_before  # worker exited
