"""Safetensors reading/writing with the reference checkpoint schema.

The on-disk schema (reference: lora_diffusion/lora.py:228-310) packs several
models' LoRA weights plus textual-inversion embeddings into one file:

* tensor keys ``"{model}:{idx}:up"`` / ``"{model}:{idx}:down"`` — the LoRA
  pair for the idx-th target layer of ``model`` (canonical enumeration order,
  see :mod:`diffusion_finetuning_tpu.lora`);
* metadata ``"{model}"`` → JSON-encoded list of target ancestor class names;
* metadata ``"{model}:{idx}:rank"`` → decimal rank string;
* TI embeddings stored under the raw token string as the tensor key with
  metadata ``token → "<embed>"`` (lora.py:253-255).

Verified byte-compatible against ``example_loras/lora_disney.safetensors``
(386 tensors: 144 UNet pairs + 48 CLIP pairs + 2 embeds).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Mapping, Optional, Sequence, Set, Tuple

import numpy as np

try:
    from safetensors import safe_open as _st_safe_open

    _HAS_SAFETENSORS = True
except Exception:  # pragma: no cover - safetensors is baked into the image
    _HAS_SAFETENSORS = False

EMBED_FLAG = "<embed>"

__all__ = [
    "EMBED_FLAG",
    "read_safetensors",
    "write_safetensors",
    "write_safeloras",
    "parse_safeloras",
    "parse_safeloras_embeds",
    "load_safeloras",
    "load_safeloras_embeds",
    "load_safeloras_both",
]


# --------------------------------------------------------------------------
# Minimal pure-numpy fallback (mirrors reference safe_open.py:13-68)
# --------------------------------------------------------------------------

_ST_DTYPES = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("<i1"),
    "U8": np.dtype("<u1"),
    "BOOL": np.dtype("?"),
}
try:
    import ml_dtypes

    _ST_DTYPES["BF16"] = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    pass

_ST_NAMES = {v: k for k, v in _ST_DTYPES.items()}


def _pure_read(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, str]]:
    import struct

    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        body = f.read()
    metadata = header.pop("__metadata__", {}) or {}
    tensors = {}
    for name, info in header.items():
        dtype = _ST_DTYPES[info["dtype"]]
        start, end = info["data_offsets"]
        arr = np.frombuffer(body[start:end], dtype=dtype).reshape(info["shape"])
        tensors[name] = arr
    return tensors, metadata


def _pure_write(tensors: Mapping[str, np.ndarray], metadata: Mapping[str, str], path: str) -> None:
    """Canonical writer, byte-compatible with the safetensors build that
    produced the reference golden files (``lora_disney.safetensors``):
    tensor keys lexicographically sorted, data offsets assigned in key
    order, metadata keys sorted, compact JSON, no header padding."""
    import struct

    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = {k: metadata[k] for k in sorted(metadata)}
    blobs = []
    offset = 0
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        raw = arr.tobytes()
        header[name] = {
            "dtype": _ST_NAMES[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        blobs.append(raw)
        offset += len(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for raw in blobs:
            f.write(raw)


# --------------------------------------------------------------------------
# Public read/write
# --------------------------------------------------------------------------


def read_safetensors(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, str]]:
    """Return (tensors, metadata) from a .safetensors file as numpy arrays."""
    if _HAS_SAFETENSORS:
        with _st_safe_open(path, framework="numpy") as f:
            metadata = f.metadata() or {}
            tensors = {k: f.get_tensor(k) for k in f.keys()}
        return tensors, metadata
    return _pure_read(path)


def write_safetensors(
    tensors: Mapping[str, np.ndarray],
    path: str,
    metadata: Optional[Mapping[str, str]] = None,
) -> None:
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    metadata = dict(metadata or {})
    # Always write via the canonical pure encoder: installed safetensors
    # builds vary in metadata ordering and header padding, which breaks the
    # bit-identical golden round-trip contract (see _pure_write).
    _pure_write(tensors, metadata, path)


# --------------------------------------------------------------------------
# LoRA schema (format level — no model objects involved)
# --------------------------------------------------------------------------


def write_safeloras(
    loras: Mapping[str, Tuple[Sequence[np.ndarray], Sequence[int], Sequence[str]]],
    path: str,
    embeds: Optional[Mapping[str, np.ndarray]] = None,
    dtype: Optional[np.dtype] = None,
) -> None:
    """Write the reference multi-model safetensors schema.

    ``loras``: {model_name: (flat [up0, down0, up1, down1, ...] arrays,
    per-pair ranks, target ancestor-class names)}.  ``embeds``: {token: [dim]}.
    Mirrors reference save_safeloras_with_embeds (lora.py:228-265).
    """
    tensors: Dict[str, np.ndarray] = {}
    metadata: Dict[str, str] = {}
    for name, (weights, ranks, target) in loras.items():
        if len(weights) != 2 * len(ranks):
            raise ValueError(
                f"model {name}: {len(weights)} tensors but {len(ranks)} ranks"
            )
        metadata[name] = json.dumps(list(target))
        for i, rank in enumerate(ranks):
            up, down = weights[2 * i], weights[2 * i + 1]
            metadata[f"{name}:{i}:rank"] = str(int(rank))
            tensors[f"{name}:{i}:up"] = np.asarray(up)
            tensors[f"{name}:{i}:down"] = np.asarray(down)
    for token, embed in (embeds or {}).items():
        metadata[token] = EMBED_FLAG
        tensors[token] = np.asarray(embed)
    if dtype is not None:
        tensors = {k: v.astype(dtype) for k, v in tensors.items()}
    write_safetensors(tensors, path, metadata)


def parse_safeloras(
    tensors: Mapping[str, np.ndarray], metadata: Mapping[str, str]
) -> Dict[str, Tuple[List[np.ndarray], List[int], List[str]]]:
    """Parse the schema back into {model: (flat weights, ranks, targets)}.

    Mirrors reference parse_safeloras (lora.py:313-371): groups tensor keys by
    the prefix before the first ':', skips TI embeds (metadata == EMBED_FLAG),
    reads rank/target from metadata, orders pairs by index with up before
    down within each pair.
    """
    loras: Dict[str, Tuple[List[np.ndarray], List[int], List[str]]] = {}
    by_model: Dict[str, List[str]] = {}
    for key in tensors:
        if ":" not in key:
            continue  # embed or foreign key
        model = key.split(":", 1)[0]
        if metadata.get(model) == EMBED_FLAG:
            continue
        by_model.setdefault(model, []).append(key)

    for model, keys in by_model.items():
        target_json = metadata.get(model)
        if target_json is None:
            raise ValueError(
                f"Tensor {keys[0]} has model {model} but no target metadata"
            )
        target = json.loads(target_json)
        idxs = sorted({int(k.split(":")[1]) for k in keys})
        if idxs != list(range(len(idxs))):
            raise ValueError(f"model {model}: non-contiguous LoRA indices {idxs}")
        weights: List[np.ndarray] = []
        ranks: List[int] = []
        for i in idxs:
            try:
                ranks.append(int(metadata[f"{model}:{i}:rank"]))
            except KeyError:
                raise ValueError(
                    f"model {model}: missing '{model}:{i}:rank' metadata "
                    "(malformed safelora file)"
                ) from None
            for part in ("up", "down"):
                key = f"{model}:{i}:{part}"
                if key not in tensors:
                    raise ValueError(
                        f"model {model}: tensor '{key}' missing — up/down "
                        "pairs must both be present"
                    )
                weights.append(np.asarray(tensors[key]))
        loras[model] = (weights, ranks, target)
    return loras


def parse_safeloras_embeds(
    tensors: Mapping[str, np.ndarray], metadata: Mapping[str, str]
) -> Dict[str, np.ndarray]:
    """{token: embedding} for every tensor flagged as an embed
    (reference lora.py:374-392)."""
    return {
        k: np.asarray(v)
        for k, v in tensors.items()
        if metadata.get(k) == EMBED_FLAG
    }


def load_safeloras(path: str):
    tensors, metadata = read_safetensors(path)
    return parse_safeloras(tensors, metadata)


def load_safeloras_embeds(path: str):
    tensors, metadata = read_safetensors(path)
    return parse_safeloras_embeds(tensors, metadata)


def load_safeloras_both(path: str):
    tensors, metadata = read_safetensors(path)
    return parse_safeloras(tensors, metadata), parse_safeloras_embeds(tensors, metadata)
