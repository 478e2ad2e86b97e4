"""ctypes bindings for the native DSP library (native/pika_dsp.cc).

``load()`` returns the bound library or None (Python fallback is used in
that case — the loader works either way).  Build with ``make -C native``
or ``python -m pika_tpu.native.build``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False

_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_I16P = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libpika_dsp.so")


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.pika_augment_i16.restype = ctypes.c_int64
    lib.pika_augment_i16.argtypes = [
        _I16P, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, _F32P, ctypes.c_int64, _F32P,
    ]
    lib.pika_edit_distance.restype = ctypes.c_int64
    lib.pika_edit_distance.argtypes = [_I32P, ctypes.c_int64, _I32P, ctypes.c_int64]
    lib.pika_rms_db.restype = ctypes.c_double
    lib.pika_rms_db.argtypes = [_F32P, ctypes.c_int64]
    _LIB = lib
    return _LIB


def augment_i16(pcm: np.ndarray, speed_rate: float, target_db: float,
                max_gain_db: float = 300.0, do_normalize: bool = True) -> Optional[np.ndarray]:
    """Native augmentation chain; returns int16-scale float32 samples or
    None if the library is unavailable.  Raises ValueError on gain
    overflow, like segment.normalize."""
    lib = load()
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, np.int16)
    n = len(pcm)
    cap = int(n / min(s for s in (speed_rate, 1.0))) + 2
    out = np.empty(cap, np.float32)
    scratch = np.empty(max(n, 1), np.float32)
    m = lib.pika_augment_i16(pcm, n, float(speed_rate), float(target_db),
                             float(max_gain_db), int(do_normalize), out, cap, scratch)
    if m < 0:
        raise ValueError("required gain exceeds max_gain_db")
    return out[:m]


def edit_distance(a, b) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    return int(lib.pika_edit_distance(a, len(a), b, len(b)))
