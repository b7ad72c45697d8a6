"""ctypes bindings for the native host runtime (native/itpu_io.cpp).

Builds the shared library on first use (g++, cached next to the source) and
falls back to the pure-Python implementations when compilation is
unavailable. The native layer covers image IO, a threaded dataset
prefetcher, STL export, and raw block persistence — the reference's C++
host-runtime roles (FileUtils, ImageSourceEngine cache, ITMMesh::WriteSTL,
MemoryBlockPersister).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libitpu_io.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "itpu_io.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.itpu_read_pgm.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.itpu_read_ppm.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.itpu_write_pgm.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int]
    lib.itpu_write_ppm.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    lib.itpu_write_stl.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.itpu_prefetcher_create.restype = ctypes.c_void_p
    lib.itpu_prefetcher_create.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.itpu_prefetcher_get.argtypes = [
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.itpu_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.itpu_save_block.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.itpu_load_block.restype = ctypes.c_int64
    lib.itpu_load_block.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
    _lib = lib
    return _lib


def read_pgm_native(path: str, height: int, width: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((height, width), dtype=np.uint16)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.itpu_read_pgm(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), ctypes.byref(w), ctypes.byref(h)
    )
    if rc != 0 or w.value != width or h.value != height:
        return None
    return out


def write_stl_native(path: str, triangles: np.ndarray) -> bool:
    """triangles: [T, 3, 3] float32."""
    lib = get_lib()
    if lib is None:
        return False
    tris = np.ascontiguousarray(triangles, dtype=np.float32)
    rc = lib.itpu_write_stl(
        path.encode(), tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(tris)
    )
    return rc == 0


class NativePrefetcher:
    """Threaded frame loader over explicit path lists."""

    def __init__(self, depth_paths, rgb_paths, height: int, width: int, n_threads: int = 2):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.height = height
        self.width = width
        self.has_rgb = rgb_paths is not None and len(rgb_paths) > 0
        dl = "\n".join(depth_paths).encode()
        rl = "\n".join(rgb_paths or []).encode()
        self._h = lib.itpu_prefetcher_create(dl, rl, width, height, n_threads)

    def get(self, index: int):
        depth = np.empty((self.height, self.width), dtype=np.uint16)
        rgb = np.empty((self.height, self.width, 3), dtype=np.uint8) if self.has_rgb else None
        ok = self._lib.itpu_prefetcher_get(
            self._h,
            index,
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if rgb is not None else None,
        )
        if not ok:
            return None
        return depth, rgb

    def close(self):
        if self._h:
            self._lib.itpu_prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
