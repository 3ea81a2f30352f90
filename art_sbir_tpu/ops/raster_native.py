"""ctypes binding for the native C++ host rasterizer (native/raster.cpp).

The native path serves the host data pipeline (offline rasterization of
stroke caches, loader-side fallbacks); the TPU path is
:mod:`art_sbir_tpu.ops.rasterize`. Builds the shared library on demand with
g++; exact-parity tested against the python oracle.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libraster.so"
_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    src = _NATIVE_DIR / "raster.cpp"
    if not src.is_file():
        raise NativeUnavailable(f"missing {src}")
    cmd = ["g++", "-O3", "-Wall", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_LIB_PATH), str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise NativeUnavailable(f"g++ build failed: {e}") from e


def load(rebuild: bool = False) -> ctypes.CDLL:
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    if rebuild or not _LIB_PATH.is_file():
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.rasterize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.rasterize_batch.restype = None
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except NativeUnavailable:
        return False


def rasterize_batch_native(strokes: np.ndarray) -> np.ndarray:
    """(B, T, 5|3) float strokes -> (B, 256, 256) float32 0/255 canvases,
    exact reference-pipeline semantics on the host."""
    lib = load()
    s = np.ascontiguousarray(strokes, np.float32)
    b, t, dims = s.shape
    out = np.empty((b, 256, 256), np.float32)
    lib.rasterize_batch(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b, t, dims,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
