"""Device-mesh utilities: the TPU replacement for the reference's
Accelerate/NCCL data parallelism.

The reference hides ``torch.distributed`` behind ``accelerate.Accelerator``
(train_lora_dreambooth.py:489-494): DDP gradient all-reduce in backward,
``wait_for_everyone`` barriers, main-process I/O gating.  TPU-native, the
same program is expressed as a single jitted train step over a
``jax.sharding.Mesh``: the batch is sharded over the ``data`` axis, params/
LoRA trees are replicated, and XLA emits the gradient all-reduce over ICI —
no explicit collectives in user code.

The mesh also reserves axes for tensor ("model") and fully-sharded ("fsdp")
layouts for configs that outgrow one chip; SD 1.5 LoRA fits per-chip, so the
default is pure DP (SURVEY.md §2.5).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Create a device mesh.  Default: 1-D data-parallel over all devices."""
    devices = jax.devices()
    n = num_devices or len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    dev_array = mesh_utils.create_device_mesh(tuple(shape), devices[:n])
    return Mesh(dev_array, tuple(axes))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                spec: Optional[P] = None) -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded along the batch dim.

    The per-host slice contract mirrors the reference's per-rank DataLoader
    sharding (Accelerate prepares a distributed sampler); multi-host setups
    feed each process its slice and this makes the global array.

    ``spec`` overrides the partitioning (default ``P("data")``) — e.g.
    ``P(None, "data")`` for multi_step batches stacked on a leading steps
    axis, where the *second* dim is the per-step batch.
    """
    if spec is None:
        spec = P("data")
    sharding = NamedSharding(mesh, spec)
    axis = list(spec).index("data") if "data" in spec else 0

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        # multi-host: every process holds its shard of the global batch
        global_shape = list(x.shape)
        global_shape[axis] *= jax.process_count()
        return jax.make_array_from_process_local_data(
            sharding, x, tuple(global_shape))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def fsdp_shardings(
    mesh: Mesh, tree: Any, axis: str = "fsdp", min_size: int = 2**16
) -> Any:
    """Per-leaf NamedShardings sharding large params over the ``axis`` mesh
    dimension (ZeRO-3-style): each leaf's largest divisible dim is split;
    small/indivisible leaves replicate.  XLA all-gathers shards at use sites
    — frozen UNet/VAE/CLIP params then cost 1/N memory per chip."""
    n = mesh.shape[axis]

    def leaf_sharding(x):
        shape = jnp.shape(x)
        if n == 1 or np.prod(shape, dtype=np.int64) < min_size:
            return NamedSharding(mesh, P())
        # shard the largest dim divisible by n
        best = None
        for d, s in enumerate(shape):
            if s % n == 0 and (best is None or s > shape[best]):
                best = d
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(leaf_sharding, tree)


def shard_tree(tree: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init over DCN (replaces Accelerate's NCCL process-group
    init, train_lora_dreambooth.py:489).  No-op when single-process."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def is_main_process() -> bool:
    """I/O gating (reference accelerator.is_main_process,
    train_lora_dreambooth.py:561, 895)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Global sync (reference accelerator.wait_for_everyone(),
    train_lora_dreambooth.py:966)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def local_batch_size(global_batch_size: int) -> int:
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} must divide process count {n}"
    )
    return global_batch_size // n
