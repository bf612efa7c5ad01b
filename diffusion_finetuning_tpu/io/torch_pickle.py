"""Pure-Python reader/writer for the PyTorch ``torch.save`` tensor format.

The reference framework stores LoRA checkpoints as flat ``.pt`` lists written
by ``torch.save`` (reference: lora_diffusion/lora.py:201-213) and loads them
with ``torch.load`` (cli_lora_add.py:31-44, lora.py:150-151).  This module
implements both directions without importing torch, returning/accepting
numpy arrays, so the TPU framework can interoperate with every legacy
checkpoint while keeping torch out of the runtime dependency set.

Two on-disk layouts are supported for reading:

* the modern zipfile container (torch >= 1.6): a zip archive holding
  ``<name>/data.pkl`` (a pickle whose tensors are persistent-id references)
  plus one raw little-endian buffer per storage under ``<name>/data/<key>``;
* the legacy sequential-pickle layout (torch < 1.6).

Writing always produces the zipfile container (protocol-2 pickle), which any
torch version from 1.6 on — including the reference's — can ``torch.load``.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, BinaryIO, Dict, List, Tuple, Union

import numpy as np

__all__ = ["load", "save", "TorchTensor"]


# --------------------------------------------------------------------------
# dtype tables
# --------------------------------------------------------------------------

# torch storage class name -> (numpy dtype, itemsize)
_STORAGE_DTYPES: Dict[str, np.dtype] = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    # bfloat16 has no numpy builtin; we use a uint16 view tagged via ml_dtypes
    "BFloat16Storage": np.dtype("<u2"),
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}

try:  # jax ships ml_dtypes; use it for a true bfloat16 numpy dtype
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

# numpy dtype -> torch storage name + torch dtype enum name (for writing)
def _storage_name_for(dtype: np.dtype) -> str:
    if _BFLOAT16 is not None and dtype == _BFLOAT16:
        return "BFloat16Storage"
    table = {
        np.dtype("float32"): "FloatStorage",
        np.dtype("float64"): "DoubleStorage",
        np.dtype("float16"): "HalfStorage",
        np.dtype("int64"): "LongStorage",
        np.dtype("int32"): "IntStorage",
        np.dtype("int16"): "ShortStorage",
        np.dtype("int8"): "CharStorage",
        np.dtype("uint8"): "ByteStorage",
        np.dtype("bool"): "BoolStorage",
        np.dtype("complex64"): "ComplexFloatStorage",
        np.dtype("complex128"): "ComplexDoubleStorage",
    }
    if dtype not in table:
        raise TypeError(f"cannot save numpy dtype {dtype} in torch format")
    return table[dtype]


class TorchTensor(np.ndarray):
    """numpy ndarray subclass marking an array loaded from / destined for
    torch serialization.  Behaves exactly like ndarray; exists so callers can
    distinguish tensor leaves from plain numpy data if they care."""


def _as_tensor(arr: np.ndarray) -> TorchTensor:
    return arr.view(TorchTensor)


# --------------------------------------------------------------------------
# Reading
# --------------------------------------------------------------------------


class _LazyStorage:
    """Deferred storage: raw bytes fetched on demand from the container."""

    __slots__ = ("dtype", "nbytes", "fetch", "storage_name", "_data")

    def __init__(self, storage_name: str, dtype: np.dtype, nbytes: int, fetch):
        self.storage_name = storage_name
        self.dtype = dtype
        self.nbytes = nbytes
        self.fetch = fetch
        self._data = None

    def data(self) -> bytes:
        if self._data is None:
            self._data = self.fetch()
        return self._data


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_args, **_kw):
    return _materialize(storage, storage_offset, size, stride)


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _materialize(storage, storage_offset, size, stride)


def _materialize(storage: "_LazyStorage", offset: int, size, stride) -> TorchTensor:
    dtype = storage.dtype
    buf = storage.data()
    size_t = tuple(int(s) for s in size)
    if len(buf) == 0:
        # first pass of the legacy two-pass load: storage bytes not read yet
        return _as_tensor(np.zeros(size_t, dtype=dtype))
    needed = (int(offset) + int(np.prod(size_t, dtype=np.int64) or 1)) * dtype.itemsize
    if len(buf) < min(needed, storage.nbytes):
        raise ValueError(
            f"storage {storage.storage_name} truncated: "
            f"{len(buf)} bytes < {needed} required"
        )
    flat = np.frombuffer(buf, dtype=dtype)
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if offset:
        flat = flat[offset:]
    if len(size) == 0:
        arr = flat[:1].reshape(())
    else:
        arr = np.lib.stride_tricks.as_strided(
            flat,
            shape=size,
            strides=tuple(s * dtype.itemsize for s in stride),
        )
    arr = np.ascontiguousarray(arr)
    if storage.storage_name == "BFloat16Storage" and _BFLOAT16 is not None:
        arr = arr.view(_BFLOAT16)
    return _as_tensor(arr)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _StorageTypeTag:
    """Stand-in for ``torch.FloatStorage`` & friends during unpickling."""

    def __init__(self, name: str):
        self.name = name


class _FakeObj:
    """Generic stand-in for unknown torch classes (e.g. dtype objects)."""

    def __init__(self, module, name):
        self.module, self.name = module, name

    def __call__(self, *a, **k):  # tolerate constructor-style use
        return self

    def __repr__(self):
        return f"<torch-stub {self.module}.{self.name}>"


_SAFE_BUILTINS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
}


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, load_storage):
        super().__init__(file, encoding="utf-8")
        self._load_storage = load_storage

    def find_class(self, module, name):
        key = (module, name)
        if key in _SAFE_BUILTINS:
            return _SAFE_BUILTINS[key]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageTypeTag(name)
        if module.startswith("torch"):
            return _FakeObj(module, name)
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module in ("builtins", "__builtin__") and name in (
            "list", "dict", "tuple", "set", "int", "float", "str", "bytes",
        ):
            return getattr(__import__("builtins"), name)
        raise pickle.UnpicklingError(f"refusing to load global {module}.{name}")

    def persistent_load(self, pid):
        # pid = ('storage', StorageTypeTag, key, location, numel[, view_md])
        # — the legacy (torch<1.6) writer appends view metadata as a 6th item
        if not (isinstance(pid, tuple) and len(pid) >= 5 and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid[:5]
        name = storage_type.name if isinstance(storage_type, _StorageTypeTag) else str(storage_type)
        dtype = _STORAGE_DTYPES[name]
        return self._load_storage(str(key), name, dtype, int(numel))


def _load_zip(fobj: BinaryIO) -> Any:
    zf = zipfile.ZipFile(fobj)
    names = zf.namelist()
    pkl_name = next(
        (n for n in names if n.endswith("/data.pkl") or n == "data.pkl"), None
    )
    if pkl_name is None:
        raise ValueError(
            "not a torch zip checkpoint: no data.pkl member "
            f"(archive contains {names[:5]}...)"
        )
    prefix = pkl_name[: -len("data.pkl")]
    cache: Dict[str, bytes] = {}

    def load_storage(key, name, dtype, numel):
        def fetch():
            if key not in cache:
                cache[key] = zf.read(f"{prefix}data/{key}")
            return cache[key]

        return _LazyStorage(name, dtype, numel * dtype.itemsize, fetch)

    with zf.open(pkl_name) as pf:
        return _TorchUnpickler(io.BytesIO(pf.read()), load_storage).load()


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def _load_legacy(fobj: BinaryIO) -> Any:
    """torch < 1.6 sequential pickle layout."""
    up = pickle.Unpickler(fobj)
    magic = up.load()
    if magic != _LEGACY_MAGIC:
        raise ValueError("not a legacy torch file")
    _protocol = pickle.Unpickler(fobj).load()
    _sys_info = pickle.Unpickler(fobj).load()

    # The legacy layout puts storage bytes AFTER the payload pickle, but
    # tensors materialize DURING unpickling — so: pass 1 unpickles with
    # empty storages (tensors come back as zero placeholders) purely to
    # drive the key/byte-section reads, then pass 2 re-unpickles the same
    # payload with the storage bytes in place.
    storages: Dict[str, _LazyStorage] = {}

    def load_storage(key, name, dtype, numel):
        if key not in storages:
            storages[key] = _LazyStorage(name, dtype, numel * dtype.itemsize, lambda: b"")
        return storages[key]

    payload_pos = fobj.tell()
    _TorchUnpickler(fobj, load_storage).load()  # pass 1: discover storages
    keys = pickle.Unpickler(fobj).load()
    for key in keys:
        st = storages[str(key)]
        (numel,) = struct.unpack("<q", fobj.read(8))
        raw = fobj.read(numel * st.dtype.itemsize)
        st._data = raw

    fobj.seek(payload_pos)
    return _TorchUnpickler(fobj, load_storage).load()  # pass 2: real data


def load(path_or_file: Union[str, os.PathLike, BinaryIO]) -> Any:
    """Load a ``torch.save`` file into numpy-backed Python objects.

    Tensors come back as :class:`TorchTensor` (an ndarray subclass); all
    container structure (dicts, lists, OrderedDicts) is preserved.  Mirrors
    ``torch.load(map_location="cpu")`` for the reference's checkpoints
    (reference: lora_diffusion/lora.py:150, cli_lora_add.py:31).
    """
    if hasattr(path_or_file, "read"):
        data = path_or_file.read()
    else:
        with open(path_or_file, "rb") as f:
            data = f.read()
    fobj = io.BytesIO(data)
    if zipfile.is_zipfile(fobj):
        fobj.seek(0)
        return _load_zip(fobj)
    fobj.seek(0)
    return _load_legacy(fobj)


# --------------------------------------------------------------------------
# Writing — hand-rolled protocol-2 pickle so torch can read it back
# --------------------------------------------------------------------------


class _PickleWriter:
    """Minimal protocol-2 pickler for the object kinds torch checkpoints use:
    None/bool/int/float/str/bytes, list, tuple, dict, OrderedDict, and numpy
    tensor leaves (emitted as ``torch._utils._rebuild_tensor_v2`` calls with
    persistent-id storage references, exactly as torch's pickler does)."""

    def __init__(self, storage_writer):
        self.out = io.BytesIO()
        self.storage_writer = storage_writer  # (np.ndarray) -> (key, storage_name, numel)
        self.memo: Dict[int, int] = {}
        self._memo_count = 0

    # -- low-level opcode helpers ------------------------------------------
    def w(self, b: bytes):
        self.out.write(b)

    def put_memo(self, obj_id: int):
        idx = self._memo_count
        self._memo_count += 1
        self.memo[obj_id] = idx
        if idx < 256:
            self.w(b"q" + struct.pack("<B", idx))  # BINPUT
        else:
            self.w(b"r" + struct.pack("<I", idx))  # LONG_BINPUT

    def global_(self, module: str, name: str):
        self.w(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    # -- object dispatch ----------------------------------------------------
    def save(self, obj):
        if obj is None:
            self.w(b"N")
        elif obj is True:
            self.w(b"\x88")
        elif obj is False:
            self.w(b"\x89")
        elif isinstance(obj, int):
            self._save_int(obj)
        elif isinstance(obj, float):
            self.w(b"G" + struct.pack(">d", obj))
        elif isinstance(obj, str):
            enc = obj.encode("utf-8")
            self.w(b"X" + struct.pack("<I", len(enc)) + enc)
        elif isinstance(obj, bytes):
            self.w(b"C" + struct.pack("<B", len(obj)) + obj if len(obj) < 256
                   else b"B" + struct.pack("<I", len(obj)) + obj)
        elif isinstance(obj, np.ndarray):
            self._save_tensor(obj)
        elif isinstance(obj, (np.floating,)):
            self.w(b"G" + struct.pack(">d", float(obj)))
        elif isinstance(obj, (np.integer,)):
            self._save_int(int(obj))
        elif isinstance(obj, OrderedDict):
            self._save_ordered_dict(obj)
        elif isinstance(obj, dict):
            self._save_dict(obj)
        elif isinstance(obj, (list,)):
            self._save_list(obj)
        elif isinstance(obj, tuple):
            self._save_tuple(obj)
        else:
            raise TypeError(f"cannot pickle {type(obj)} into torch format")

    def _save_int(self, v: int):
        if 0 <= v < 256:
            self.w(b"K" + struct.pack("<B", v))
        elif -2147483648 <= v < 2147483648:
            self.w(b"J" + struct.pack("<i", v))
        else:
            enc = pickle.encode_long(v)
            self.w(b"\x8a" + struct.pack("<B", len(enc)) + enc)

    def _save_list(self, obj):
        self.w(b"]")
        self.put_memo(id(obj))
        if obj:
            self.w(b"(")
            for it in obj:
                self.save(it)
            self.w(b"e")  # APPENDS

    def _save_tuple(self, obj):
        if not obj:
            self.w(b")")
            return
        self.w(b"(")
        for it in obj:
            self.save(it)
        self.w(b"t")
        self.put_memo(id(obj))

    def _save_dict(self, obj):
        self.w(b"}")
        self.put_memo(id(obj))
        if obj:
            self.w(b"(")
            for k, v in obj.items():
                self.save(k)
                self.save(v)
            self.w(b"u")  # SETITEMS

    def _save_ordered_dict(self, obj):
        self.global_("collections", "OrderedDict")
        self.w(b")")  # empty tuple arg
        self.w(b"R")  # REDUCE
        self.put_memo(id(obj))
        if obj:
            self.w(b"(")
            for k, v in obj.items():
                self.save(k)
                self.save(v)
            self.w(b"u")
        # torch also sets instance state for _metadata; plain OD is fine

    def _save_tensor(self, arr: np.ndarray):
        raise NotImplementedError  # provided by _TorchPickler


def _contiguous_strides(shape) -> tuple:
    strides = []
    acc = 1
    for s in reversed(shape):
        strides.append(acc)
        acc *= int(s)
    return tuple(reversed(strides))


class _TorchPickler(_PickleWriter):
    """Orders opcodes correctly for tensor REDUCE calls."""

    def _save_tensor(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        key, storage_name, numel = self.storage_writer(arr)
        self.global_("torch._utils", "_rebuild_tensor_v2")
        self.w(b"(")  # MARK: start args tuple
        # arg 0: persistent storage reference
        self.w(b"(")
        enc = b"storage"
        self.w(b"X" + struct.pack("<I", len(enc)) + enc)
        self.global_("torch", storage_name)
        kenc = key.encode()
        self.w(b"X" + struct.pack("<I", len(kenc)) + kenc)
        loc = b"cpu"
        self.w(b"X" + struct.pack("<I", len(loc)) + loc)
        self._save_int(numel)
        self.w(b"t")
        self.w(b"Q")  # BINPERSID
        # arg 1: storage offset
        self._save_int(0)
        # arg 2: size
        self._save_tuple(tuple(int(s) for s in arr.shape))
        # arg 3: stride (contiguous)
        self._save_tuple(_contiguous_strides(arr.shape))
        # arg 4: requires_grad
        self.w(b"\x89")
        # arg 5: backward hooks (empty OrderedDict)
        self._save_ordered_dict(OrderedDict())
        self.w(b"t")  # close args tuple
        self.w(b"R")  # REDUCE
        self.put_memo(id(arr))

    def dumps(self, obj) -> bytes:
        self.w(b"\x80\x02")  # PROTO 2
        self.save(obj)
        self.w(b".")
        return self.out.getvalue()


def save(obj: Any, path: Union[str, os.PathLike]) -> None:
    """Write ``obj`` (nested dict/list/tuple structure with numpy tensor
    leaves) as a torch-zipfile ``.pt`` readable by ``torch.load``.

    Matches the container layout torch>=1.6 produces: ``archive/data.pkl``,
    ``archive/data/<key>`` raw buffers, ``archive/version``.
    """
    storages: List[Tuple[str, bytes]] = []

    def storage_writer(arr: np.ndarray):
        dtype = arr.dtype
        storage_name = _storage_name_for(dtype)
        raw = arr.tobytes()
        key = str(len(storages))
        storages.append((key, raw))
        return key, storage_name, int(arr.size)

    pickler = _TorchPickler(storage_writer)
    data_pkl = pickler.dumps(obj)

    archive = "archive"
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive}/data.pkl", data_pkl)
        for key, raw in storages:
            zf.writestr(f"{archive}/data/{key}", raw)
        zf.writestr(f"{archive}/version", "3\n")
