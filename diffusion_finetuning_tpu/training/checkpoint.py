"""Full train-state checkpoint / resume (orbax-backed).

The reference checkpoints only LoRA deltas + TI embeds, never optimizer
state (SURVEY.md §5: resume = re-inject saved weights).  For long
production runs this module adds real fault tolerance: the whole training
state (trainable params, optimizer moments, step counter, RNG key) is saved
atomically and restored exactly, so a preempted run continues bit-identically.

LoRA/TI state is tiny (MBs), so checkpoints are cheap; the frozen model
params are NOT saved — they reload from the model directory.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the image, but stay safe
    _HAVE_ORBAX = False


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_train_state(
    ckpt_dir: str,
    state: Dict[str, Any],
    step: Optional[int] = None,
    keep: int = 3,
) -> str:
    """Atomically save ``{"params", "opt_state", "step"}`` (+ anything else
    in ``state`` except ``static``) under ``ckpt_dir/step_N``."""
    to_save = {k: v for k, v in state.items() if k != "static"}
    to_save = _to_host(to_save)
    step = int(step if step is not None else to_save.get("step", 0))
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")

    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, to_save, force=True)
    else:  # numpy fallback — write to a tmp dir and rename so a preemption
        # mid-save never leaves a truncated step_N that latest_checkpoint
        # would pick up after retention pruned the good ones
        import shutil

        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        flat, treedef = jax.tree_util.tree_flatten(to_save)
        np.savez(os.path.join(tmp, "state.npz"),
                 **{str(i): a for i, a in enumerate(flat)})
        # saved so restore can detect structure drift (it is compared, not
        # just informational)
        with open(os.path.join(tmp, "treedef.txt"), "w") as f:
            f.write(str(treedef))
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)

    # retention
    steps = sorted(
        int(d.split("_", 1)[1]) for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    )
    for old in steps[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, f"step_{old}"), ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        int(d.split("_", 1)[1]) for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    )
    if not steps:
        return None
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{steps[-1]}")


def restore_train_state(
    path: str, target: Dict[str, Any]
) -> Dict[str, Any]:
    """Restore into the structure of ``target`` (its ``static`` entry is
    carried over untouched)."""
    to_restore = {k: v for k, v in target.items() if k != "static"}
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=_to_host(to_restore))
    else:
        data = np.load(os.path.join(path, "state.npz"))
        flat = [data[str(i)] for i in range(len(data.files))]
        treedef = jax.tree_util.tree_structure(to_restore)
        saved_def_path = os.path.join(path, "treedef.txt")
        if os.path.exists(saved_def_path):
            with open(saved_def_path) as f:
                saved_def = f.read()
            if saved_def != str(treedef):
                raise ValueError(
                    f"checkpoint at {path} has a different state structure "
                    "than the restore target (optimizer/config drift?); "
                    "refusing to misassign leaves"
                )
        restored = jax.tree_util.tree_unflatten(treedef, flat)
    out = dict(restored)
    if "static" in target:
        out["static"] = target["static"]
    return out
