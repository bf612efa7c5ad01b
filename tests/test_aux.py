"""Aux subsystems: checkpoint/resume, profiling hooks, eval math."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from diffusion_finetuning_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from diffusion_finetuning_tpu.utils.eval import image_grid, text_img_alignment
from diffusion_finetuning_tpu.utils.profiling import MetricLogger, StepTimer


def test_checkpoint_roundtrip(tmp_path):
    params = {"lora": {"up": jnp.ones((4, 2)), "down": jnp.zeros((2, 8))}}
    opt = optax.adam(1e-3)
    state = {
        "params": params,
        "opt_state": opt.init(params),
        "step": jnp.asarray(7, jnp.int32),
        "static": {"frozen": jnp.full((3,), 9.0)},
    }
    d = str(tmp_path / "ckpts")
    save_train_state(d, state, keep=2)
    save_train_state(d, {**state, "step": jnp.asarray(9, jnp.int32)}, keep=2)

    path = latest_checkpoint(d)
    assert path and path.endswith("step_9")
    target = jax.tree_util.tree_map(jnp.zeros_like, {k: v for k, v in state.items()
                                                     if k != "static"})
    target["static"] = state["static"]
    restored = restore_train_state(path, target)
    assert int(restored["step"]) == 9
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["lora"]["up"]), np.ones((4, 2))
    )
    # static carried over, not restored
    np.testing.assert_array_equal(np.asarray(restored["static"]["frozen"]),
                                  np.full((3,), 9.0))


def test_checkpoint_retention(tmp_path):
    params = {"w": jnp.zeros((2,))}
    opt = optax.sgd(1e-2)
    d = str(tmp_path / "c")
    for s in (1, 2, 3, 4):
        save_train_state(
            d, {"params": params, "opt_state": opt.init(params),
                "step": jnp.asarray(s)}, keep=2,
        )
    import os

    kept = sorted(os.listdir(d))
    assert kept == ["step_3", "step_4"]


def test_step_timer():
    t = StepTimer(window=4)
    assert t.tick() is None
    for _ in range(4):
        dt = t.tick()
        assert dt is not None and dt >= 0
    assert t.mean > 0 and t.steps_per_sec > 0


def test_metric_logger_noop():
    ml = MetricLogger(log_dir=None, use_wandb=False)
    ml.log({"loss": 1.0}, step=1)  # must not raise
    ml.close()


def test_metric_logger_tfevents_roundtrip(tmp_path):
    # The synchronous writer must produce files tensorboard actually reads:
    # load through EventFileLoader, which migrates v1 simple_value summaries
    # into tensor form — assert the migrated values, not the raw field.
    ml = MetricLogger(log_dir=str(tmp_path), use_wandb=False)
    ml.log({"loss": 1.5, "lr": 2e-4}, step=3)
    ml.log({"loss": 0.25}, step=4)
    ml.close()

    import os

    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert len(files) == 1
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )
    from tensorboard.util import tensor_util

    seen = {}
    for ev in EventFileLoader(str(tmp_path / files[0])).Load():
        for v in ev.summary.value:
            seen[(v.tag, ev.step)] = float(tensor_util.make_ndarray(v.tensor))
            assert v.metadata.plugin_data.plugin_name == "scalars"
    assert seen[("loss", 3)] == 1.5
    assert abs(seen[("lr", 3)] - 2e-4) < 1e-9
    assert seen[("loss", 4)] == 0.25


def test_text_img_alignment_math():
    # identical embeddings -> cosine 1 everywhere
    e = np.eye(4, 8, dtype=np.float32) + 1.0
    out = text_img_alignment(e, e, e)
    assert abs(out["text_alignment_avg"] - 1.0) < 1e-5
    # image alignment: cosine of normalized rows with mean of normalized rows
    assert 0.0 < out["image_alignment_avg"] <= 1.0 + 1e-6
    assert len(out["text_alignment_all"]) == 4


def test_image_grid():
    from PIL import Image

    imgs = [Image.new("RGB", (8, 8), (i * 40, 0, 0)) for i in range(5)]
    grid = image_grid(imgs)  # 3x3 for 5 images
    assert grid.size == (24, 24)
    grid2 = image_grid(imgs, rows=1)
    assert grid2.size == (40, 8)
