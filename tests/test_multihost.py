"""Real multi-process execution of the distribution layer.

Everything else in the suite exercises the mesh code with N virtual devices
in ONE process; the reference's Accelerate DDP really runs as N processes
(/root/reference/training_scripts/train_lora_dreambooth.py:489-494, 966).
This test spawns TWO actual OS processes that ``jax.distributed.initialize``
against a local coordinator (Gloo collectives — the CPU stand-in for DCN),
each owning 2 virtual CPU devices, build one global 4-device ``data`` mesh,
and run the tiny full train step (UNet+CLIP+VAE loss, multi-group AdamW,
TI constraints) with per-process batch slices — exercising
``initialize_distributed``, ``shard_batch``'s
``make_array_from_process_local_data`` branch, ``local_batch_size``,
``is_main_process`` I/O gating, and ``barrier`` for real.  The loss must
match an in-process single-process run of the identical program.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft
from diffusion_finetuning_tpu.parallel import mesh as mesh_lib
from diffusion_finetuning_tpu.training.train_step import jit_train_step


def _single_process_loss(n_devices: int) -> float:
    """The same tiny train step on an in-process n-device data mesh."""
    mesh = mesh_lib.make_mesh(num_devices=n_devices)
    setup = graft._tiny_train_setup(batch_n=n_devices)
    state = mesh_lib.replicate(setup["state"], mesh)
    batch = mesh_lib.shard_batch(setup["batch"], mesh)
    jitted = jit_train_step(setup["step_fn"], mesh=mesh)
    _, metrics = jitted(state, batch, jax.random.PRNGKey(3))
    return float(metrics["loss"])


def test_two_process_distributed_train_step():
    ref = _single_process_loss(4)

    # children inherit the suite's compile-cache dir and matmul precision so
    # their numerics (and compile costs) match the in-process reference
    extra_env = {
        "JAX_DEFAULT_MATMUL_PRECISION": jax.config.jax_default_matmul_precision
        or "highest",
    }
    cache_dir = jax.config.jax_compilation_cache_dir
    if cache_dir:
        extra_env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
        extra_env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"

    result = graft.dryrun_multihost(
        num_processes=2,
        devices_per_process=2,
        extra_env=extra_env,
        spawn_reference=False,
    )
    losses = result["losses"]
    assert len(losses) == 2
    # every process computes the same global loss (replicated output)...
    assert losses[0] == losses[1]
    # ...and it matches the single-process run of the identical program
    assert losses[0] == pytest.approx(ref, rel=1e-5, abs=1e-6)
