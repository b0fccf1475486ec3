"""ctypes bindings for the native feature-IO library.

``native/feature_io.cpp`` provides .npy parsing, temporal resampling, and a
multithreaded batch assembler.  The Python side transparently falls back to
the numpy implementations when the shared library is not built
(``make -C native``), so nothing hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cands = [os.path.join(here, 'native', 'libdvc_feature_io.so'),
             os.environ.get('DVC_FEATURE_IO_LIB', '')]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.dvc_load_npy.argtypes = [ctypes.c_char_p,
                                 np.ctypeslib.ndpointer(np.float32),
                                 ctypes.c_long, ctypes.c_long]
    lib.dvc_load_npy.restype = ctypes.c_int
    lib.dvc_npy_shape.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_long),
                                  ctypes.POINTER(ctypes.c_long)]
    lib.dvc_npy_shape.restype = ctypes.c_int
    lib.dvc_resize_feature.argtypes = [
        np.ctypeslib.ndpointer(np.float32), ctypes.c_long, ctypes.c_long,
        np.ctypeslib.ndpointer(np.float32), ctypes.c_long, ctypes.c_int]
    lib.dvc_resize_feature.restype = None
    lib.dvc_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.uint8),
        np.ctypeslib.ndpointer(np.int64)]
    lib.dvc_load_batch.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def load_npy(path: str) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    if lib.dvc_npy_shape(path.encode(), ctypes.byref(rows),
                         ctypes.byref(cols)) != 0:
        return None
    out = np.empty((rows.value, cols.value), np.float32)
    if lib.dvc_load_npy(path.encode(), out, rows.value, cols.value) != 0:
        return None
    return out


def resize_feature(feats: np.ndarray, new_size: int,
                   method: str = 'nearest') -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    feats = np.ascontiguousarray(feats, np.float32)
    out = np.empty((new_size, feats.shape[1]), np.float32)
    lib.dvc_resize_feature(feats, feats.shape[0], feats.shape[1], out,
                           new_size, int(method == 'linear'))
    return out


def load_batch(paths, T: int, C: int, rescale=True, method='nearest'):
    """Parallel load+resample of B feature files into (B, T, C) + mask.
    Missing/mismatched files come back as zero rows with mask False and
    length 0 (caller may zero-pad-degrade like the reference)."""
    lib = get_lib()
    if lib is None:
        return None
    B = len(paths)
    out = np.zeros((B, T, C), np.float32)
    mask = np.zeros((B, T), np.uint8)
    lengths = np.zeros((B,), np.int64)
    arr = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    lib.dvc_load_batch(arr, B, T, C, int(rescale),
                       int(method == 'linear'), out, mask, lengths)
    return out, mask.astype(bool), lengths
