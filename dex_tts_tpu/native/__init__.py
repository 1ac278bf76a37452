"""Native (C++/OpenMP) host kernels, loaded via ctypes.

The shared library is compiled on first use (g++ is part of the toolchain);
`maximum_path_native` mirrors the on-device MAS and the reference Cython
kernel (reference: DEX-TTS/model/monotonic_align/__init__.py:8-23).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mas.cpp")
_LIB = os.path.join(_DIR, "libmas.so")

_lib = None


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-fopenmp",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.mas_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.mas_batch.restype = None
    lib.mas_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def maximum_path_native(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Host MAS on (B, Tx, Ty) float32 scores with a binary mask."""
    lib = load_library()
    value = np.ascontiguousarray(value * mask, np.float32)
    b, tx, ty = value.shape
    paths = np.zeros((b, tx, ty), np.int32)
    t_xs = np.ascontiguousarray(mask[:, :, 0].sum(1), np.int32)
    t_ys = np.ascontiguousarray(mask[:, 0, :].sum(1), np.int32)
    lib.mas_batch(
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b,
        tx,
        ty,
    )
    return (paths * mask.astype(np.int32)).astype(np.float32)
