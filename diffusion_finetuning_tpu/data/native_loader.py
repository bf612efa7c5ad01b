"""ctypes bindings for the native C++ data-loader.

``native/dataloader.cpp`` does multithreaded JPEG/PNG decode + bilinear
short-side resize + center crop + [-1,1] normalize + h-flip, assembling
NHWC float32 batches off the GIL — the native input pipeline feeding the
device (the counterpart of the reference's torch DataLoader + torchvision
C++ transform kernels, dataset.py:126-139).

Build: ``make -C native`` (auto-attempted on first use).  All entry points
degrade gracefully: ``available()`` is False when the library can't be
built/loaded and callers fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_LIB_NAME = "libdft_dataloader.so"
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _cpu_fingerprint() -> str:
    """Boot-time CPU feature fingerprint (matches tests/conftest.py)."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:8]


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        # DFT_NATIVE_LOADER=0 disables the native path entirely (callers
        # fall back to PIL) — an operational kill-switch and a bisecting
        # lever when hunting in-process native corruption.
        if os.environ.get("DFT_NATIVE_LOADER", "1") == "0":
            return None
        path = os.path.join(_NATIVE_DIR, _LIB_NAME)
        # run make unconditionally: it is timestamp-based and near-free when
        # up to date, and an existing-but-stale .so (built before a
        # dataloader.cpp change) must not be silently used.  The .so is
        # built -march=native, so it must also be rebuilt (-B) when the HOST
        # changes: executing an .so from a prior host's CPU can SIGILL after
        # a CI VM migration (same hazard class as the XLA AOT cache — see
        # tests/conftest.py).
        stamp = os.path.join(_NATIVE_DIR, ".host_fingerprint")
        fp = _cpu_fingerprint()
        try:
            with open(stamp) as f:
                force = f.read().strip() != fp
        except OSError:
            force = True
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR] + (["-B"] if force else []),
                check=True, capture_output=True, timeout=120,
            )
            if force:
                with open(stamp, "w") as f:
                    f.write(fp)
        except Exception:
            if not os.path.exists(path):
                return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.dft_version.restype = ctypes.c_int
        lib.dft_load_one.restype = ctypes.c_int
        lib.dft_load_one.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.dft_load_batch.restype = ctypes.c_int
        lib.dft_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        if lib.dft_version() != 1:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_image(path: str, size: int, flip: bool = False) -> Optional[np.ndarray]:
    """(size, size, 3) float32 in [-1, 1], or None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((size, size, 3), np.float32)
    rc = lib.dft_load_one(
        path.encode(), size, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def load_batch(
    paths: Sequence[str], size: int, flips: Optional[Sequence[bool]] = None,
    n_threads: int = 0,
) -> Optional[np.ndarray]:
    """(N, size, size, 3) float32 batch decoded in a native thread pool."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_flips = (ctypes.c_int * n)(*[int(bool(f)) for f in (flips or [0] * n)])
    rc = lib.dft_load_batch(
        c_paths, n, size, c_flips,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    return out if rc == 0 else None
