"""TPU-native LoRA core.

The reference implements LoRA by *module monkeypatching*: every targeted
``nn.Linear`` is swapped for a ``LoraInjectedLinear`` computing
``linear(x) + scale * lora_up(lora_down(x))`` (reference:
lora_diffusion/lora.py:32-50, 137-183).  In JAX, models are pure functions
over parameter pytrees, so "injection" becomes *pytree surgery*: a model
declares an ordered list of LoRA-capable dense layers (:class:`LoraTarget`),
and the LoRA weights live in a separate nested-dict tree mirroring the param
tree, with leaves ``{"up": (out, r), "down": (r, in), "scale": ()}``.  The
model's dense layers add ``scale * (x @ down.T) @ up.T`` when an entry for
their path exists (optionally via a fused Pallas kernel, see
:mod:`diffusion_finetuning_tpu.ops.lora_matmul`).

This module keeps the reference's public names and semantics:

* ``inject_trainable_lora``  — build a fresh trainable LoRA tree
  (``lora_down`` ~ N(0, 1/r), ``lora_up`` = 0, lora.py:46-47), optionally
  seeded from a ``.pt`` flat list (lora.py:150-151, 175-177);
* ``extract_lora_ups_down`` / ``save_lora_weight`` / ``save_lora_as_json`` —
  flat interleaved ``[up0, down0, up1, ...]`` fp16 lists (lora.py:201-225);
* ``save_safeloras_with_embeds`` / ``parse_safeloras`` /
  ``convert_loras_to_safeloras_with_embeds`` — the consolidated safetensors
  schema (lora.py:228-407);
* ``weight_apply_lora`` — permanent merge ``W += alpha * up @ down``
  (lora.py:410-424);
* the ``monkeypatch_*`` family — functional equivalents returning new trees
  (lora.py:427-594);
* ``tune_lora_scale`` (lora.py:597-600), ``inspect_lora`` (lora.py:735-752),
  ``save_all`` (lora.py:755-821), TI embed application (lora.py:613-669).

Weight-shape convention matches the on-disk reference format: ``up`` is
``(out_features, rank)`` and ``down`` is ``(rank, in_features)`` (torch
``nn.Linear`` layout).  Flax kernels are ``(in, out)``, so merges transpose.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Mapping, Optional, Sequence, Set, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .io import safetensors_io, torch_pickle
from .io.safetensors_io import (
    EMBED_FLAG,
    load_safeloras,
    load_safeloras_both,
    load_safeloras_embeds,
    parse_safeloras,
    parse_safeloras_embeds,
)
from .tree_util import Path, tree_get, tree_has, tree_set, tree_delete

__all__ = [
    "EMBED_FLAG",
    "UNET_DEFAULT_TARGET_REPLACE",
    "UNET_EXTENDED_TARGET_REPLACE",
    "TEXT_ENCODER_DEFAULT_TARGET_REPLACE",
    "DEFAULT_TARGET_REPLACE",
    "LoraTarget",
    "lora_targets_from_module",
    "inject_trainable_lora",
    "extract_lora_ups_down",
    "save_lora_weight",
    "save_lora_as_json",
    "save_safeloras",
    "save_safeloras_with_embeds",
    "convert_loras_to_safeloras",
    "convert_loras_to_safeloras_with_embeds",
    "parse_safeloras",
    "parse_safeloras_embeds",
    "load_safeloras",
    "load_safeloras_embeds",
    "load_safeloras_both",
    "weight_apply_lora",
    "monkeypatch_lora",
    "monkeypatch_replace_lora",
    "monkeypatch_or_replace_lora",
    "monkeypatch_or_replace_safeloras",
    "monkeypatch_remove_lora",
    "monkeypatch_add_lora",
    "tune_lora_scale",
    "inspect_lora",
    "lora_tree_to_flat",
    "flat_to_lora_tree",
    "_text_lora_path",
    "_ti_lora_path",
    "save_all",
]

# Ancestor-class target sets — identical strings to the reference
# (lora.py:53-56) so safetensors metadata round-trips bit-for-bit.
UNET_DEFAULT_TARGET_REPLACE = {"CrossAttention", "Attention", "GEGLU"}
TEXT_ENCODER_DEFAULT_TARGET_REPLACE = {"CLIPAttention"}
DEFAULT_TARGET_REPLACE = UNET_DEFAULT_TARGET_REPLACE
# Conv2d LoRA extension (upstream added LoraInjectedConv2d after this
# snapshot; BASELINE.json's north star names it): ResnetBlock2D convs.
UNET_EXTENDED_TARGET_REPLACE = UNET_DEFAULT_TARGET_REPLACE | {"ResnetBlock2D"}


@dataclasses.dataclass(frozen=True)
class LoraTarget:
    """One LoRA-capable dense layer of a model.

    ``path`` addresses the layer inside the model's param tree (the module
    directory holding ``kernel``/``bias``).  ``ancestor`` is the reference
    class name this layer sits under ({"CrossAttention","Attention","GEGLU",
    "CLIPAttention"}), which is what target_replace sets match against —
    the reference's `_find_modules` addressing scheme (lora.py:78-114).
    """

    path: Path
    in_features: int
    out_features: int
    ancestor: str
    # dense targets: None.  conv targets: (kh, kw) — up/down pairs are then
    # torch-Conv2d-shaped: up (out, r, 1, 1), down (r, in, kh, kw)
    kernel_size: Optional[Tuple[int, int]] = None

    @property
    def is_conv(self) -> bool:
        return self.kernel_size is not None


def filter_targets(
    targets: Sequence[LoraTarget], target_replace_module: Set[str]
) -> List[LoraTarget]:
    """Keep targets whose ancestor class name is in the replace set, in
    canonical order (the reference enumeration order, verified against
    example_loras/lora_disney.safetensors)."""
    return [t for t in targets if t.ancestor in set(target_replace_module)]


def lora_targets_from_module(
    module,
    rng: jax.Array,
    *init_args,
    target_replace_module: Set[str] = DEFAULT_TARGET_REPLACE,
    include_conv: bool = False,
    **init_kwargs,
) -> List[LoraTarget]:
    """Derive a :class:`LoraTarget` list from an ARBITRARY Flax module by
    ancestor class-name matching — the reference's ``_find_modules``
    addressing scheme (lora.py:61-134) for models this framework does not
    ship.

    The built-in models expose hand-ordered target lists
    (``unet_lora_targets`` / ``text_encoder_lora_targets``, fingerprint-
    verified against the golden safetensors); a user bringing their own
    Flax model calls this instead: every ``nn.Dense`` (and, with
    ``include_conv``, ``nn.Conv``) that is a descendant of a module whose
    *class name* is in ``target_replace_module`` becomes a target, in
    ancestor-major depth-first pre-order — the same enumeration
    ``_find_modules_v2`` produces from ``named_modules()`` (reference
    lora.py:78-114).  A layer under two matched ancestors is yielded once,
    for the first ancestor that reaches it (the reference's
    skip-already-injected behavior, lora.py:98-104).

    ``rng`` / ``*init_args`` / ``**init_kwargs`` are whatever
    ``module.init`` takes — submodule structure and kernel shapes are
    discovered by shape-level tracing only (``nn.Module.module_paths`` +
    ``jax.eval_shape``); no parameters are materialized.

    The returned targets drive the whole target-based API surface:
    ``inject_trainable_lora`` (build/seed trainable trees),
    ``weight_apply_lora`` / ``materialize_lora_tree`` (permanent merge into
    the user's param tree), ``save_*``/``monkeypatch_*``/``tune_lora_scale``.
    Runtime-dynamic LoRA (unmerged ``W·x + scale·up(down(x))`` during
    apply) additionally needs the model to use LoRA-aware layers
    (:class:`models.layers.LoRADense`); plain ``nn.Dense`` models use the
    merge path.
    """
    import flax.linen as nn

    paths = module.module_paths(rng, *init_args, **init_kwargs)
    shapes = jax.eval_shape(
        lambda k: module.init(k, *init_args, **init_kwargs), rng
    )["params"]
    replace = set(target_replace_module)
    targets: List[LoraTarget] = []
    seen: Set[str] = set()
    for apath, amod in paths.items():
        aname = type(amod).__name__
        if aname not in replace:
            continue
        prefix = apath + "/" if apath else ""
        for p, m in paths.items():
            # descendants of the ancestor, plus the ancestor itself (torch
            # named_modules() yields the module under "" first)
            if p in seen or not (p == apath or p.startswith(prefix)):
                continue
            is_dense = isinstance(m, nn.Dense)
            is_conv = include_conv and isinstance(m, nn.Conv)
            if not (is_dense or is_conv):
                continue
            seen.add(p)
            key: Path = tuple(p.split("/"))
            kernel = tree_get(shapes, key + ("kernel",))
            if is_dense:
                targets.append(
                    LoraTarget(key, kernel.shape[0], kernel.shape[1], aname))
            else:
                kh, kw, cin, cout = kernel.shape
                targets.append(
                    LoraTarget(key, cin, cout, aname, kernel_size=(kh, kw)))
    return targets


# --------------------------------------------------------------------------
# Tree <-> flat-list conversion
# --------------------------------------------------------------------------


def lora_tree_to_flat(
    lora_tree: Mapping[str, Any], targets: Sequence[LoraTarget]
) -> List[np.ndarray]:
    """Flatten a LoRA tree into the reference interleaved [up, down, ...] list."""
    flat: List[np.ndarray] = []
    for t in targets:
        leaf = tree_get(lora_tree, t.path)
        flat.append(np.asarray(leaf["up"]))
        flat.append(np.asarray(leaf["down"]))
    return flat


def flat_to_lora_tree(
    flat: Sequence[np.ndarray],
    targets: Sequence[LoraTarget],
    scale: float = 1.0,
    dtype: Any = jnp.float32,
) -> Dict[str, Any]:
    """Build a LoRA tree from an interleaved flat list (order = canonical)."""
    if len(flat) != 2 * len(targets):
        raise ValueError(
            f"flat list has {len(flat)} tensors but model has {len(targets)} targets"
        )
    tree: Dict[str, Any] = {}
    for i, t in enumerate(targets):
        up = jnp.asarray(np.asarray(flat[2 * i], dtype=np.float32), dtype=dtype)
        down = jnp.asarray(np.asarray(flat[2 * i + 1], dtype=np.float32), dtype=dtype)
        if t.is_conv:
            # conv pairs are torch-Conv2d-shaped; accept 2-D rank factors too
            r = up.shape[1]
            if up.ndim == 2:
                up = up.reshape(t.out_features, r, 1, 1)
            if down.ndim == 2:
                down = down.reshape(down.shape[0], t.in_features, *t.kernel_size)
            ok = (
                up.shape[0] == t.out_features
                and down.shape[1] == t.in_features
                and tuple(down.shape[2:]) == tuple(t.kernel_size)
            )
        else:
            ok = up.shape[0] == t.out_features and down.shape[1] == t.in_features
        if not ok:
            raise ValueError(
                f"target {t.path}: file pair (up {up.shape}, down {down.shape}) "
                f"does not match layer ({t.in_features} -> {t.out_features})"
            )
        leaf = {"up": up, "down": down, "scale": jnp.asarray(scale, dtype=jnp.float32)}
        tree = tree_set(tree, t.path, leaf)
    return tree


def _load_flat(loras: Union[str, Sequence[np.ndarray]]) -> List[np.ndarray]:
    if isinstance(loras, (str,)):
        obj = torch_pickle.load(loras)
        if not isinstance(obj, list):
            raise ValueError(f"{loras} is not a flat LoRA list")
        return [np.asarray(a) for a in obj]
    return [np.asarray(a) for a in loras]


# --------------------------------------------------------------------------
# Injection / extraction
# --------------------------------------------------------------------------


def inject_trainable_lora(
    targets: Sequence[LoraTarget],
    rng: jax.Array,
    r: int = 4,
    loras: Optional[Union[str, Sequence[np.ndarray]]] = None,
    scale: float = 1.0,
    dtype: Any = jnp.float32,
) -> Dict[str, Any]:
    """Create a trainable LoRA tree for ``targets``.

    Mirrors reference ``inject_trainable_lora`` (lora.py:137-183): validates
    ``r <= min(in, out)`` (lora.py:36-39), initializes ``down ~ N(0, 1/r)``
    and ``up = 0`` (lora.py:46-47), and optionally seeds both from a ``.pt``
    flat list for warm restarts (lora.py:150-151, 175-177).

    Returns the LoRA tree — in JAX the "trainable parameter group" is simply
    this tree; take gradients with respect to it.
    """
    flat = _load_flat(loras) if loras is not None else None
    if flat is not None:
        # warm restart: route through the validating loader (length + shape
        # checks, conv 2-D/4-D normalization) — identical semantics to the
        # reference seeding path (lora.py:150-151, 175-177)
        return flat_to_lora_tree(flat, targets, scale=scale, dtype=dtype)
    tree: Dict[str, Any] = {}
    for i, t in enumerate(targets):
        if r > min(t.in_features, t.out_features):
            raise ValueError(
                f"LoRA rank {r} must be less or equal than "
                f"{min(t.in_features, t.out_features)}"
            )
        if t.is_conv:
            rng, key = jax.random.split(rng)
            kh, kw = t.kernel_size
            down = jax.random.normal(key, (r, t.in_features, kh, kw), dtype) / r
            up = jnp.zeros((t.out_features, r, 1, 1), dtype)
        else:
            rng, key = jax.random.split(rng)
            down = (jax.random.normal(key, (r, t.in_features), dtype) / r)
            up = jnp.zeros((t.out_features, r), dtype)
        leaf = {"up": up, "down": down, "scale": jnp.asarray(scale, jnp.float32)}
        tree = tree_set(tree, t.path, leaf)
    return tree


def extract_lora_ups_down(
    lora_tree: Mapping[str, Any], targets: Sequence[LoraTarget]
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """[(up, down), ...] in canonical order (reference lora.py:186-198)."""
    pairs = []
    for t in targets:
        if tree_has(lora_tree, t.path):
            leaf = tree_get(lora_tree, t.path)
            pairs.append((leaf["up"], leaf["down"]))
    if not pairs:
        raise ValueError("No lora injected.")
    return pairs


# --------------------------------------------------------------------------
# Saving
# --------------------------------------------------------------------------


def save_lora_weight(
    lora_tree: Mapping[str, Any],
    targets: Sequence[LoraTarget],
    path: str = "./lora.pt",
) -> None:
    """Flat interleaved fp16 list via torch pickle (reference lora.py:201-213)."""
    weights: List[np.ndarray] = []
    for up, down in extract_lora_ups_down(lora_tree, targets):
        weights.append(np.asarray(up, dtype=np.float16))
        weights.append(np.asarray(down, dtype=np.float16))
    torch_pickle.save(weights, path)


def save_lora_as_json(
    lora_tree: Mapping[str, Any], targets: Sequence[LoraTarget], path: str = "./lora.json"
) -> None:
    weights = []
    for up, down in extract_lora_ups_down(lora_tree, targets):
        weights.append(np.asarray(up, np.float32).tolist())
        weights.append(np.asarray(down, np.float32).tolist())
    with open(path, "w") as f:
        json.dump(weights, f)


ModelMapEntry = Tuple[Mapping[str, Any], Sequence[LoraTarget], Set[str]]


def save_safeloras_with_embeds(
    modelmap: Mapping[str, ModelMapEntry],
    embeds: Optional[Mapping[str, np.ndarray]] = None,
    outpath: str = "./lora.safetensors",
) -> None:
    """``modelmap = {name: (lora_tree, targets, target_replace_set)}``.

    Writes the reference consolidated schema (lora.py:228-265): tensors
    ``{name}:{i}:up/down``, metadata ``{name}`` -> JSON target list and
    ``{name}:{i}:rank``; embeds under the raw token with ``<embed>`` flag.
    """
    loras = {}
    for name, (lora_tree, targets, target_replace) in modelmap.items():
        sel = filter_targets(targets, target_replace)
        flat = lora_tree_to_flat(lora_tree, sel)
        ranks = [int(flat[2 * i].shape[1]) for i in range(len(sel))]
        # Native dtypes are preserved — the reference's safetensors saver
        # writes model weights as-is (lora.py:250-251); only the .pt saver
        # casts to fp16 (lora.py:210).
        loras[name] = (flat, ranks, sorted(target_replace))
    emb = {k: np.asarray(v) for k, v in (embeds or {}).items()}
    safetensors_io.write_safeloras(loras, outpath, embeds=emb)


def save_safeloras(
    modelmap: Mapping[str, ModelMapEntry], outpath: str = "./lora.safetensors"
) -> None:
    save_safeloras_with_embeds(modelmap, None, outpath)


def convert_loras_to_safeloras_with_embeds(
    modelmap: Mapping[str, Tuple[str, Set[str], int]],
    embeds: Optional[Mapping[str, Union[str, np.ndarray]]] = None,
    outpath: str = "./lora.safetensors",
) -> None:
    """Convert flat ``.pt`` lists into the safetensors schema
    (reference lora.py:268-303).

    ``modelmap = {name: (.pt path, target_replace_set, rank)}``;
    ``embeds`` may map tokens to arrays or be a ``.pt`` path holding a dict.
    """
    loras = {}
    for name, (pt_path, target_replace, rank) in modelmap.items():
        flat = _load_flat(pt_path)
        n_pairs = len(flat) // 2
        ranks = [int(rank)] * n_pairs
        loras[name] = (flat, ranks, sorted(target_replace))  # native dtypes
    emb: Dict[str, np.ndarray] = {}
    if embeds is not None:
        if isinstance(embeds, str):
            embeds = torch_pickle.load(embeds)
        for token, vec in embeds.items():
            emb[token] = np.asarray(vec)
    safetensors_io.write_safeloras(loras, outpath, embeds=emb)


def convert_loras_to_safeloras(
    modelmap: Mapping[str, Tuple[str, Set[str], int]],
    outpath: str = "./lora.safetensors",
) -> None:
    convert_loras_to_safeloras_with_embeds(modelmap, None, outpath)


# --------------------------------------------------------------------------
# Merging / patching (functional monkeypatch family)
# --------------------------------------------------------------------------


def weight_apply_lora(
    params: Mapping[str, Any],
    loras: Union[str, Sequence[np.ndarray]],
    targets: Sequence[LoraTarget],
    alpha: float = 1.0,
) -> Dict[str, Any]:
    """Permanently merge LoRA into base weights: ``W += alpha * up @ down``
    (reference lora.py:410-424).  Flax kernels are (in, out), so the delta is
    transposed.  Returns a new params tree."""
    flat = _load_flat(loras)
    if len(flat) != 2 * len(targets):
        raise ValueError(
            f"{len(flat)} tensors for {len(targets)} targets"
        )
    new_params = params
    for i, t in enumerate(targets):
        up = np.asarray(flat[2 * i], np.float32)
        down = np.asarray(flat[2 * i + 1], np.float32)
        layer = dict(tree_get(params, t.path))
        kernel = layer["kernel"]
        if t.is_conv:
            # normalize 2-D rank factors like flat_to_lora_tree does
            if up.ndim == 4:
                up = up[:, :, 0, 0]
            if down.ndim == 2:
                down = down.reshape(down.shape[0], t.in_features, *t.kernel_size)
            # torch conv delta (out,in,kh,kw) -> flax (kh,kw,in,out)
            dt = np.einsum("or,rikl->oikl", up, down)
            delta = jnp.asarray(dt.transpose(2, 3, 1, 0), dtype=kernel.dtype)
        else:
            delta = jnp.asarray((up @ down).T, dtype=kernel.dtype)
        layer["kernel"] = kernel + alpha * delta
        new_params = tree_set(new_params, t.path, layer)
    return new_params


def materialize_lora_tree(params: Mapping[str, Any], lora) -> Mapping[str, Any]:
    """Fold a LoRA variable-collection tree into a params tree on device.

    ``merged.kernel = kernel + scale * delta`` at every LoRA'd layer — the
    device-side, jit-compatible analogue of :func:`weight_apply_lora`
    (reference lora.py:410-424), consuming the in-memory ``lora`` collection
    (leaves ``{up, down, scale}`` mirroring param paths) instead of a flat
    checkpoint list.  The delta math matches the layers' dynamic path and
    ``weight_apply_lora``: dense ``(up @ down)^T``; conv 1x1-up composed
    with the kxk down-conv.

    Serving pipelines use this to run patched models at base-model speed:
    the per-step rank-r matmuls are MXU-hostile (N=r lanes of 128) and cost
    ~33 ms per 50-step 512^2 image at rank 4 (measured v5e), while this
    merge is a one-off millisecond-scale dispatch per LoRA/scale change.
    """
    if lora is None:
        return params

    def walk(p_node, l_node):
        if isinstance(l_node, Mapping) and "up" in l_node and not isinstance(
            l_node["up"], Mapping
        ):
            up, down, scale = l_node["up"], l_node["down"], l_node["scale"]
            kernel = p_node["kernel"]
            up32 = jnp.asarray(up, jnp.float32)
            down32 = jnp.asarray(down, jnp.float32)
            if up32.ndim == 4:
                # conv pair: up (out, r, 1, 1) o down (r, in, kh, kw)
                # -> flax HWIO delta (kh, kw, in, out)
                delta = jnp.einsum("or,rikl->klio", up32[:, :, 0, 0], down32)
            else:
                # dense pair: (out, r) @ (r, in) -> flax (in, out)
                delta = (up32 @ down32).T
            merged = dict(p_node)
            merged["kernel"] = (
                jnp.asarray(kernel, jnp.float32) + scale * delta
            ).astype(kernel.dtype)
            return merged
        merged = dict(p_node)
        for key, child in l_node.items():
            merged[key] = walk(p_node[key], child)
        return merged

    return walk(params, lora)


def monkeypatch_lora(
    loras: Union[str, Sequence[np.ndarray]],
    targets: Sequence[LoraTarget],
    r: int = 4,
    dtype: Any = jnp.float32,
) -> Dict[str, Any]:
    """Build a LoRA tree from saved weights (reference lora.py:427-459).
    In the functional world patch/replace are the same operation — the
    returned tree supersedes whatever tree was active before."""
    del r  # rank comes from the tensors themselves
    return flat_to_lora_tree(_load_flat(loras), targets, scale=1.0, dtype=dtype)


def monkeypatch_replace_lora(
    loras: Union[str, Sequence[np.ndarray]],
    targets: Sequence[LoraTarget],
    r: int = 4,
    dtype: Any = jnp.float32,
) -> Dict[str, Any]:
    return monkeypatch_lora(loras, targets, r, dtype)


def monkeypatch_or_replace_lora(
    loras: Union[str, Sequence[np.ndarray]],
    targets: Sequence[LoraTarget],
    r: Union[int, List[int]] = 4,
    dtype: Any = jnp.float32,
) -> Dict[str, Any]:
    """Reference lora.py:497-538 — accepts per-module rank lists; ranks are
    read from the tensors, the list is validated if provided."""
    flat = _load_flat(loras)
    if isinstance(r, list) and len(r) not in (0, len(targets)):
        raise ValueError(f"rank list of {len(r)} for {len(targets)} targets")
    return flat_to_lora_tree(flat, targets, scale=1.0, dtype=dtype)


def monkeypatch_or_replace_safeloras(
    models: Any, safeloras: Tuple[Mapping[str, np.ndarray], Mapping[str, str]]
) -> Dict[str, Dict[str, Any]]:
    """Dispatch parsed safeloras onto a pipe-like object by model name
    (reference lora.py:541-551).  ``models`` must expose
    ``lora_targets(name, target_replace) -> [LoraTarget]``; returns
    {model_name: lora_tree} and also assigns ``models.<name>_lora`` when the
    attribute slot exists."""
    tensors, metadata = safeloras
    loras = parse_safeloras(tensors, metadata)
    out: Dict[str, Dict[str, Any]] = {}
    lora_targets_fn = getattr(models, "lora_targets", None)
    for name, (flat, ranks, target) in loras.items():
        # only a *missing* model maps to the reference's skip message
        # (lora.py:546-549); bugs inside lora_targets must propagate
        if lora_targets_fn is None:
            print(f"No model provided for {name}, contained in Lora")
            continue
        try:
            targets = lora_targets_fn(name, set(target))
        except KeyError:
            print(f"No model provided for {name}, contained in Lora")
            continue
        tree = flat_to_lora_tree(flat, targets, scale=1.0)
        out[name] = tree
        if hasattr(models, f"{name}_lora"):
            setattr(models, f"{name}_lora", tree)
    return out


def monkeypatch_remove_lora(lora_tree: Mapping[str, Any]) -> Dict[str, Any]:
    """Restore the un-LoRA'd model — functionally: an empty tree
    (reference lora.py:554-567 swaps back plain nn.Linear)."""
    del lora_tree
    return {}


def monkeypatch_add_lora(
    lora_tree: Mapping[str, Any],
    loras: Union[str, Sequence[np.ndarray]],
    targets: Sequence[LoraTarget],
    alpha: float = 1.0,
    beta: float = 1.0,
) -> Dict[str, Any]:
    """Runtime compose: ``up <- alpha*up_new + beta*up_old`` and same for
    down (reference lora.py:570-594 — an approximate product merge)."""
    flat = _load_flat(loras)
    new_tree = lora_tree
    for i, t in enumerate(targets):
        leaf = dict(tree_get(lora_tree, t.path))
        up_new = jnp.asarray(np.asarray(flat[2 * i], np.float32), leaf["up"].dtype)
        down_new = jnp.asarray(np.asarray(flat[2 * i + 1], np.float32), leaf["down"].dtype)
        if t.is_conv:
            # accept the 2-D rank-factor layout like flat_to_lora_tree does
            # (lora.py flat loader) — adding a 2-D factor to the resident
            # 4-D leaf would crash (down) or silently broadcast into a
            # wrong-shaped tensor (up)
            if up_new.ndim == 2:
                up_new = up_new.reshape(t.out_features, up_new.shape[1], 1, 1)
            if down_new.ndim == 2:
                down_new = down_new.reshape(
                    down_new.shape[0], t.in_features, *t.kernel_size)
        if up_new.shape != leaf["up"].shape or down_new.shape != leaf["down"].shape:
            raise ValueError(
                f"add_lora shape mismatch at {t.path}: file has "
                f"{up_new.shape}/{down_new.shape}, tree has "
                f"{leaf['up'].shape}/{leaf['down'].shape} (different rank?)"
            )
        leaf["up"] = alpha * up_new + beta * leaf["up"]
        leaf["down"] = alpha * down_new + beta * leaf["down"]
        new_tree = tree_set(new_tree, t.path, leaf)
    return new_tree


def tune_lora_scale(lora_tree: Mapping[str, Any], alpha: float = 1.0) -> Dict[str, Any]:
    """Set every ``scale`` leaf to ``alpha`` (reference lora.py:597-600).
    The scale is an array leaf, so re-tuning never triggers recompilation."""

    def _walk(node):
        if isinstance(node, Mapping):
            if "up" in node and "down" in node and "scale" in node:
                out = dict(node)
                out["scale"] = jnp.asarray(alpha, jnp.float32)
                return out
            return {k: _walk(v) for k, v in node.items()}
        return node

    return _walk(lora_tree)


def inspect_lora(lora_tree: Mapping[str, Any]) -> Dict[str, List[float]]:
    """Per-module mean |up @ down| drift metric (reference lora.py:735-752)."""
    moved: Dict[str, List[float]] = {}

    def _walk(node, prefix=""):
        if isinstance(node, Mapping):
            if "up" in node and "down" in node:
                up = np.asarray(node["up"], np.float32)
                down = np.asarray(node["down"], np.float32)
                if up.ndim == 4:  # conv pair: flatten to rank factors
                    up = up.reshape(up.shape[0], -1)
                    down = down.reshape(down.shape[0], -1)
                dist = float(np.abs(up @ down).mean())
                moved.setdefault(prefix, []).append(dist)
                return
            for k, v in node.items():
                _walk(v, f"{prefix}.{k}" if prefix else k)

    _walk(lora_tree)
    return moved


# --------------------------------------------------------------------------
# Sidecar path helpers (reference lora.py:603-610)
# --------------------------------------------------------------------------


def _text_lora_path(path: str) -> str:
    assert path.endswith(".pt"), "Only .pt files are supported"
    return ".".join(path.split(".")[:-1] + ["text_encoder", "pt"])


def _ti_lora_path(path: str) -> str:
    assert path.endswith(".pt"), "Only .pt files are supported"
    return ".".join(path.split(".")[:-1] + ["ti", "pt"])


# --------------------------------------------------------------------------
# Unified saver (reference lora.py:755-821)
# --------------------------------------------------------------------------


def save_all(
    unet_lora: Optional[Mapping[str, Any]],
    text_lora: Optional[Mapping[str, Any]],
    unet_targets: Sequence[LoraTarget],
    text_targets: Sequence[LoraTarget],
    learned_embeds: Optional[Mapping[str, np.ndarray]],
    save_path: str,
    save_lora: bool = True,
    save_ti: bool = True,
    target_replace_module_text: Set[str] = TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
    target_replace_module_unet: Set[str] = DEFAULT_TARGET_REPLACE,
    safe_form: bool = True,
) -> None:
    """Save UNet+text LoRAs and TI embeds together.

    ``safe_form=True`` -> one consolidated ``.safetensors``;
    ``safe_form=False`` -> reference ``.pt`` triple: ``path``,
    ``path.text_encoder.pt``, ``path.ti.pt`` (lora.py:767-796).
    """
    embeds = {k: np.asarray(v, np.float32) for k, v in (learned_embeds or {}).items()}
    if not safe_form:
        if save_ti:
            ti_path = _ti_lora_path(save_path)
            torch_pickle.save(dict(embeds), ti_path)
            for tok in embeds:
                print(
                    f"Current Learned Embeddings for {tok}:, id {tok} ",
                    embeds[tok][:4],
                )
        if save_lora:
            assert unet_lora is not None
            save_lora_weight(
                unet_lora,
                filter_targets(unet_targets, target_replace_module_unet),
                save_path,
            )
            if text_lora is not None:
                save_lora_weight(
                    text_lora,
                    filter_targets(text_targets, target_replace_module_text),
                    _text_lora_path(save_path),
                )
        return

    assert save_path.endswith(".safetensors"), (
        f"Save path : {save_path} should end with .safetensors"
    )
    modelmap: Dict[str, ModelMapEntry] = {}
    if save_lora:
        assert unet_lora is not None
        modelmap["unet"] = (unet_lora, unet_targets, target_replace_module_unet)
        if text_lora is not None:
            modelmap["text_encoder"] = (
                text_lora,
                text_targets,
                target_replace_module_text,
            )
    save_safeloras_with_embeds(modelmap, embeds if save_ti else None, save_path)
