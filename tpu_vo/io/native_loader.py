"""ctypes bindings for the native C++ data-loading runtime.

Wraps native/vo_loader.cpp (threaded PNG/JPEG decode with the exact BT.601
grayscale arithmetic, ordered prefetch ring, packed .vobin sequences). The
library is loaded from tpu_vo/io/libvo_loader.so (built by `make native`)
or rebuilt on demand with g++; all entry points degrade gracefully to the
pure-Python loader when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "vo_loader.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "libvo_loader.so")


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-o", _SO, "-lpng", "-ljpeg", "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.vl_open_dataset.restype = ctypes.c_int64
    lib.vl_open_dataset.argtypes = [ctypes.c_char_p]
    lib.vl_num_frames.argtypes = [ctypes.c_int64]
    lib.vl_width.argtypes = [ctypes.c_int64]
    lib.vl_height.argtypes = [ctypes.c_int64]
    lib.vl_start_prefetch.argtypes = [ctypes.c_int64, ctypes.c_int,
                                      ctypes.c_int]
    lib.vl_start_prefetch.restype = None
    lib.vl_next.argtypes = [ctypes.c_int64, u8p]
    lib.vl_read_frame.argtypes = [ctypes.c_int64, ctypes.c_int, u8p]
    lib.vl_close.argtypes = [ctypes.c_int64]
    lib.vl_close.restype = None
    lib.vl_pack_dataset.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_int]
    lib.vl_open_pack.restype = ctypes.c_int64
    lib.vl_open_pack.argtypes = [ctypes.c_char_p]
    lib.vl_pack_info.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    lib.vl_pack_read.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                                 u8p]
    lib.vl_close_pack.argtypes = [ctypes.c_int64]
    lib.vl_close_pack.restype = None
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


class NativeDataset:
    """Threaded native dataset reader with ordered frame delivery."""

    def __init__(self, path: str, n_threads: int = 4, depth: int = 8):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._h = lib.vl_open_dataset(path.encode())
        if not self._h:
            raise FileNotFoundError(f"no decodable images in {path!r}")
        self.num_frames = lib.vl_num_frames(self._h)
        self.width = lib.vl_width(self._h)
        self.height = lib.vl_height(self._h)
        self._n_threads = n_threads
        self._depth = depth
        self._started = False

    def read(self, idx: int) -> Optional[np.ndarray]:
        buf = np.empty((self.height, self.width), dtype=np.uint8)
        r = self._lib.vl_read_frame(
            self._h, idx, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return buf if r == 1 else None

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        if not self._started:
            self._lib.vl_start_prefetch(self._h, self._n_threads, self._depth)
            self._started = True
        i = 0
        while True:
            buf = np.empty((self.height, self.width), dtype=np.uint8)
            r = self._lib.vl_next(
                self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if r < 0:
                return
            if r == 1:
                yield i, buf
            # r == 0: unreadable/mismatched image — skipped (main.cpp:137)
            i += 1

    def close(self):
        if self._h:
            self._lib.vl_close(self._h)
            self._h = 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def pack_dataset(dataset_dir: str, out_path: str, n_threads: int = 4) -> int:
    """Decode a directory once into a packed .vobin; returns frame count."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = lib.vl_pack_dataset(dataset_dir.encode(), out_path.encode(), n_threads)
    if n < 0:
        raise RuntimeError(f"pack failed ({n})")
    return n


class PackedSequence:
    """mmap-backed packed sequence reader (zero decode cost)."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._h = lib.vl_open_pack(path.encode())
        if not self._h:
            raise FileNotFoundError(f"bad pack file {path!r}")
        T = ctypes.c_int()
        H = ctypes.c_int()
        W = ctypes.c_int()
        lib.vl_pack_info(self._h, ctypes.byref(T), ctypes.byref(H),
                         ctypes.byref(W))
        self.num_frames, self.height, self.width = T.value, H.value, W.value

    def read(self, start: int = 0, count: Optional[int] = None) -> np.ndarray:
        count = self.num_frames - start if count is None else count
        out = np.empty((count, self.height, self.width), dtype=np.uint8)
        r = self._lib.vl_pack_read(
            self._h, start, count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if r != count:
            raise RuntimeError(f"pack read failed ({r})")
        return out

    def close(self):
        if self._h:
            self._lib.vl_close_pack(self._h)
            self._h = 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
