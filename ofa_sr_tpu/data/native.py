"""ctypes binding for the native C++ loader (csrc/loader).

The native library provides PNG/PPM decode, PIL-compatible bicubic resize,
and a threaded SR-sample prefetch loader (decode -> crop/flip/rotate ->
2x/4x downscale) — the TPU-host replacement for the reference's vendored
C-backed DataLoader (my_data_loader.py). Builds on demand via `make -C
csrc`; everything degrades gracefully to the PIL pipeline when the library
or toolchain is unavailable (`native_available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SO_PATH = os.path.join(_REPO_ROOT, "csrc", "libofa_loader.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", os.path.join(_REPO_ROOT, "csrc")],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.ofa_image_dims.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.ofa_image_dims.restype = ctypes.c_int
    lib.ofa_decode_image.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float)]
    lib.ofa_decode_image.restype = ctypes.c_int
    lib.ofa_resize_bicubic.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int]
    lib.ofa_resize_bicubic.restype = ctypes.c_int
    lib.ofa_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.ofa_loader_create.restype = ctypes.c_void_p
    lib.ofa_loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.ofa_loader_n_batches.argtypes = [ctypes.c_void_p]
    lib.ofa_loader_n_batches.restype = ctypes.c_long
    lib.ofa_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.ofa_loader_next.restype = ctypes.c_int
    lib.ofa_loader_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def decode_image(path: str) -> np.ndarray:
    """PNG/PPM -> float32 HWC [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.ofa_image_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError("native decode failed: %s" % path)
    out = np.empty((h.value, w.value, 3), np.float32)
    if lib.ofa_decode_image(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))) != 0:
        raise IOError("native decode failed: %s" % path)
    return out


def resize_bicubic(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """PIL-compatible bicubic on float32 HWC."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    src = np.ascontiguousarray(src, np.float32)
    sh, sw, c = src.shape
    dst = np.empty((dh, dw, c), np.float32)
    lib.ofa_resize_bicubic(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sh, sw, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw)
    return dst


class NativeSRLoader:
    """Threaded native batch loader over HR image files: yields
    {'image','x2','x4'} NHWC float32 batches (augment mode: random
    crop+flip+rotate; eval mode: ModCrop(4), batch must be 1 unless all
    images share a size)."""

    def __init__(self, paths, crop=96, batch_size=16, augment=True,
                 n_threads=4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.paths = list(paths)
        self.crop = crop
        self.batch_size = batch_size
        self.augment = augment
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._handle = lib.ofa_loader_create(arr, len(self.paths), crop,
                                             batch_size, int(augment),
                                             n_threads)
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        if self.augment:
            return len(self.paths) // self.batch_size
        return -(-len(self.paths) // self.batch_size)

    def __iter__(self):
        lib = self._lib
        lib.ofa_loader_start_epoch(self._handle, self.epoch)
        cs = self.crop
        while True:
            hr = np.empty((self.batch_size, cs, cs, 3), np.float32)
            x2 = np.empty((self.batch_size, cs // 2, cs // 2, 3), np.float32)
            x4 = np.empty((self.batch_size, cs // 4, cs // 4, 3), np.float32)
            n = lib.ofa_loader_next(
                self._handle,
                hr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                x2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                x4.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if n <= 0:
                if n < 0:
                    raise IOError("native loader batch failed")
                return
            yield {"image": hr[:n], "x2": x2[:n], "x4": x4[:n]}

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.ofa_loader_destroy(self._handle)
            self._handle = None
