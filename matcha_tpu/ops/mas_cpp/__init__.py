"""ctypes loader/builder for the C++ MAS CPU reference.

Compiles `mas.cpp` with g++ on first use (cached next to the source) and exposes
`maximum_path_cpp(value, mask)` with the same API as the JAX/Pallas variants.
Plays the role of the reference's compiled Cython extension
(`/root/reference/compiler_cython.py`, `core.pyx`).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "mas.cpp")
_LIB = os.path.join(_HERE, "libmas.so")
_lock = threading.Lock()
_lib = None


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.mas_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.mas_batch.restype = None
        _lib = lib
        return lib


def mas_batch_cpp(score: np.ndarray, t_x: np.ndarray, t_y: np.ndarray) -> np.ndarray:
    """Raw batched DP: (B, Tx, Ty) float32 scores -> (B, Tx, Ty) int32 path."""
    lib = _load()
    score = np.ascontiguousarray(score, dtype=np.float32)
    t_x = np.ascontiguousarray(t_x, dtype=np.int32)
    t_y = np.ascontiguousarray(t_y, dtype=np.int32)
    b, tx, ty = score.shape
    path = np.zeros((b, tx, ty), dtype=np.int32)
    lib.mas_batch(
        score.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, tx, ty,
    )
    return path


def maximum_path_cpp(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Reference-wrapper semantics (`monotonic_align/__init__.py:40`), numpy in/out."""
    value = np.asarray(value, dtype=np.float32) * np.asarray(mask, dtype=np.float32)
    mask = np.asarray(mask)
    t_x = mask[:, :, 0].sum(axis=1).astype(np.int32)
    t_y = mask[:, 0, :].sum(axis=1).astype(np.int32)
    return mas_batch_cpp(value, t_x, t_y).astype(np.float32)
