"""Native (C++) runtime components with build-on-first-use + ctypes bindings.

Components:
* radix_index.cpp — prefix-cache radix index over KV pages (see
  engine/prefix_cache.py for the Python reference implementation).

The .so is compiled with g++ on first import into the package directory;
failures degrade gracefully (callers fall back to pure Python).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdstts_native.so")
_SRC = os.path.join(_DIR, "radix_index.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=180,
        )
        return True
    except Exception:
        return False


def load_native():
    """Return the ctypes lib or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.rpi_new.restype = ctypes.c_void_p
        lib.rpi_new.argtypes = [ctypes.c_uint32]
        lib.rpi_free.argtypes = [ctypes.c_void_p]
        lib.rpi_size.restype = ctypes.c_uint64
        lib.rpi_size.argtypes = [ctypes.c_void_p]
        lib.rpi_match.restype = ctypes.c_uint32
        lib.rpi_match.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_uint32,
        ]
        lib.rpi_insert.restype = ctypes.c_uint32
        lib.rpi_insert.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.rpi_evict_lru.restype = ctypes.c_int64
        lib.rpi_evict_lru.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeRadixIndex:
    """Thin OO wrapper over the C radix index."""

    def __init__(self, page_size: int):
        import numpy as np

        self._np = np
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.rpi_new(page_size))
        self.page_size = page_size

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.rpi_free(self._h)
        except Exception:
            pass

    def match(self, tokens: list[int], max_pages: int = 4096) -> list[int]:
        np = self._np
        arr = np.asarray(tokens, np.int32)
        out = np.zeros((max_pages,), np.int64)
        n = self._lib.rpi_match(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(arr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_pages,
        )
        return out[:n].tolist()

    def insert(self, tokens: list[int], pages: list[int]) -> list[int]:
        """Returns the subset of `pages` newly referenced by the index."""
        np = self._np
        arr = np.asarray(tokens, np.int32)
        parr = np.asarray(pages, np.int64)
        mask = np.zeros((len(pages),), np.uint8)
        self._lib.rpi_insert(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(arr),
            parr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(parr),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return [int(p) for p, m in zip(pages, mask) if m]

    def evict_lru(self) -> int:
        return int(self._lib.rpi_evict_lru(self._h))

    def __len__(self) -> int:
        return int(self._lib.rpi_size(self._h))
