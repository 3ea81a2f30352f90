"""ctypes binding for the native C++ image pipeline (native/imgpipe.cpp):
threaded JPEG/PNG decode + Pillow-exact bicubic resize + center crop.

The native path replaces the reference's torch DataLoader worker processes
(reference `train.py:154-155`) on the host side of the TPU pipeline: PIL
decode under CPython serializes on the GIL's Python glue, while one
``decode_resize_batch`` call fans a whole batch over a C++ thread pool.
Output is bit-identical to :func:`art_sbir_tpu.data.loader.decode_image`
(same system libjpeg-turbo/libpng, Pillow's exact fixed-point resampling —
tested in tests/test_native_loader.py); images the native decoder does not
support (CMYK, 16-bit, exotic containers, corrupt files) are reported
per-image and the caller falls back to PIL for those only.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libimgpipe.so"
_lib: Optional[ctypes.CDLL] = None

_MODES = {"square": 0, "shortest_crop": 1}


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    src = _NATIVE_DIR / "imgpipe.cpp"
    if not src.is_file():
        raise NativeUnavailable(f"missing {src}")
    cmd = ["g++", "-O3", "-Wall", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_LIB_PATH), str(src), "-ljpeg", "-lpng", "-lpthread"]
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
    lib.decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
    ]
    lib.decode_resize_batch.restype = None
    if not hasattr(lib, "decode_resize_batch_mem") and not rebuild:
        return load(rebuild=True)  # stale .so from before the mem entry
    lib.decode_resize_batch_mem.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.decode_resize_batch_mem.restype = None
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except NativeUnavailable:
        return False


def default_threads() -> int:
    return max(1, os.cpu_count() or 1)


def decode_batch(
    paths: Sequence[Path | str],
    size: int,
    resize_mode: str = "square",
    grayscale: bool = False,
    n_threads: Optional[int] = None,
) -> Tuple[np.ndarray, List[int]]:
    """Decode+resize ``paths`` into one (N, size, size, C) uint8 array.

    Returns ``(batch, failed)`` where ``failed`` lists the indices the
    native pipeline could not handle (their rows are undefined — decode
    those with PIL). ctypes releases the GIL for the call, so the C++
    thread pool runs truly parallel under CPython.
    """
    if resize_mode not in _MODES:
        raise ValueError(f"unknown resize_mode {resize_mode}")
    lib = load()
    n = len(paths)
    ch = 1 if grayscale else 3
    out = np.empty((n, size, size, ch), np.uint8)
    status = np.zeros(n, np.int32)
    if n == 0:
        return out, []
    arr = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths]
    )
    lib.decode_resize_batch(
        arr, n, size, _MODES[resize_mode], int(grayscale),
        n_threads or default_threads(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    failed = np.nonzero(status)[0].tolist()
    return out, failed


def decode_batch_mem(
    buffers: Sequence[bytes],
    size: int,
    resize_mode: str = "square",
    grayscale: bool = False,
    n_threads: Optional[int] = None,
) -> Tuple[np.ndarray, List[int]]:
    """:func:`decode_batch` over in-memory byte streams (no filesystem) —
    the serving path's HTTP request bodies. Same status/fallback contract;
    bit-identical to the PIL path on supported inputs."""
    if resize_mode not in _MODES:
        raise ValueError(f"unknown resize_mode {resize_mode}")
    lib = load()
    n = len(buffers)
    ch = 1 if grayscale else 3
    out = np.empty((n, size, size, ch), np.uint8)
    status = np.zeros(n, np.int32)
    if n == 0:
        return out, []
    # c_char_p keeps a borrowed pointer into each bytes object (kept
    # alive by `buffers` for the call); lengths ride separately so
    # embedded NULs are fine
    bufs = (ctypes.c_char_p * n)(*buffers)
    lens = (ctypes.c_longlong * n)(*[len(b) for b in buffers])
    lib.decode_resize_batch_mem(
        bufs, lens, n, size, _MODES[resize_mode], int(grayscale),
        n_threads or default_threads(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    failed = np.nonzero(status)[0].tolist()
    return out, failed
