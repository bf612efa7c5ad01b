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


# Megatron-style tensor-parallel placement: module name -> which kernel dim
# to split over the tp axis.  "col" splits the OUTPUT features (each device
# computes a slice of the projection), "row" splits the INPUT features (each
# device contracts its slice; XLA all-reduces the partial sums at the next
# use).  Pairing col->row per block keeps exactly one all-reduce per
# attention / feed-forward sub-block — the scaling-book recipe, expressed as
# param shardings with XLA inserting the collectives.
_TP_COL = {"to_q", "to_k", "to_v",      # attention head projections (UNet)
           "q_proj", "k_proj", "v_proj",  # CLIP attention
           "proj",                        # GEGLU up-projection (net_0/proj)
           "fc1",                         # CLIP MLP up
           "proj_in"}                     # transformer-block entry
_TP_ROW = {"to_out", "out_proj", "net_2", "fc2", "proj_out"}


def tp_shardings(mesh: Mesh, tree: Any, axis: str = "tp") -> Any:
    """Per-leaf NamedShardings for tensor ("model") parallelism.

    Splits every attention/MLP projection kernel in the tree over the
    ``axis`` mesh dimension using the column/row rules above; biases follow
    their kernel's output split; everything else (convs, norms, embeddings,
    time MLP) replicates.  Correctness never depends on the placement —
    GSPMD repartitions as needed — so indivisible dims simply replicate.

    The reference has no model-parallel story at all (one CUDA device per
    process); this is the TPU-native answer for configs whose activations
    or latency outgrow one chip: annotate the params, jit the same program,
    and the compiler emits the per-sub-block all-reduce over ICI.
    """
    from jax.tree_util import DictKey, tree_flatten_with_path, tree_unflatten

    n = mesh.shape[axis]
    rep = NamedSharding(mesh, P())
    leaves, treedef = tree_flatten_with_path(tree)
    out = []
    for path, leaf in leaves:
        names = [k.key for k in path if isinstance(k, DictKey)]
        shape = jnp.shape(leaf)
        sh = rep
        if n > 1 and len(names) >= 2:
            module, param = names[-2], names[-1]
            if param == "kernel" and len(shape) == 2:
                if module in _TP_COL and shape[1] % n == 0:
                    sh = NamedSharding(mesh, P(None, axis))
                elif module in _TP_ROW and shape[0] % n == 0:
                    sh = NamedSharding(mesh, P(axis, None))
            elif (param == "bias" and module in _TP_COL
                  and len(shape) == 1 and shape[0] % n == 0):
                sh = NamedSharding(mesh, P(axis))
        out.append(sh)
    return tree_unflatten(treedef, out)


def trainer_mesh(eff_batch: int, tensor_parallel: int = 1) -> Optional[Mesh]:
    """Mesh for a trainer run, or ``None`` for single-device.

    The ``data`` axis takes the largest device count dividing the effective
    per-step batch (so every shard sees whole examples); ``tensor_parallel``
    devices are additionally grouped under a ``tp`` axis that
    :func:`tp_state_shardings` uses to split the frozen UNet/CLIP
    projections Megatron-style inside the train step.  ``tp=1`` keeps the
    historical 1-D ``("data",)`` mesh so existing compiled programs are
    unchanged.
    """
    devices = jax.devices()
    tp = max(1, tensor_parallel)
    if len(devices) % tp or len(devices) < tp:
        raise ValueError(
            f"tensor_parallel={tp} does not divide device count {len(devices)}"
        )
    avail = len(devices) // tp
    data = max(d for d in range(1, avail + 1) if eff_batch % d == 0)
    if data * tp == 1:
        return None
    if tp == 1:
        return make_mesh(num_devices=data)
    return make_mesh(
        num_devices=data * tp, axes=("data", "tp"), shape=(data, tp)
    )


def tp_state_shardings(mesh: Mesh, state: Any, axis: str = "tp") -> Any:
    """Train-state sharding pytree for tensor-parallel training.

    The frozen UNet/CLIP params (all the FLOPs in the train step) split
    over the ``tp`` axis via :func:`tp_shardings`; the trainable LoRA/TI
    leaves, optimizer state, and everything else replicate — they are
    rank-r-tiny, and GSPMD inserts the reshards/grad-reductions where the
    replicated adapters meet the split activations.  Pass the result as
    ``state_shardings`` to ``jit_train_step`` / ``FusedDispatcher``.
    """
    rep = NamedSharding(mesh, P())
    sh = jax.tree_util.tree_map(lambda _: rep, state)
    static = dict(sh["static"])
    for key in ("unet_params", "text_params"):
        if key in state["static"]:
            static[key] = tp_shardings(mesh, state["static"][key], axis=axis)
    sh["static"] = static
    return sh


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


def coordination_barrier(name: str = "sync", timeout_s: float = 1200.0) -> None:
    """Process-level barrier over the DCN coordination service.

    Unlike :func:`barrier` (which runs a device collective), this never
    touches the devices — usable BEFORE any executable has run, e.g. to
    line processes up between AOT compilation and the first collective
    dispatch (whose Gloo/NCCL rendezvous has a short key-exchange deadline
    that a peer still busy compiling would blow)."""
    if jax.process_count() > 1:
        from jax._src import distributed

        client = distributed.global_state.client
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def local_batch_size(global_batch_size: int) -> int:
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} must divide process count {n}"
    )
    return global_batch_size // n
