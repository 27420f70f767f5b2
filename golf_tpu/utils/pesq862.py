"""ctypes binding for the native P.862 PESQ implementation.

``native/pesq862.cpp`` implements the full published P.862/P.862.2
pipeline (level align, crude time align, Bark spectrum, Zwicker loudness,
asymmetric disturbance, L6/L2 aggregation, MOS-LQO map) from scratch —
the real perceptual metric behind ``eval_pesq.py`` (reference
``eval_pesq.py:8,35``). Scores are P.862-structured but not bit-identical
to the ITU reference binary (band tables derived from the bark formula,
simplified fine alignment).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libpesq862.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    fp = ctypes.POINTER(ctypes.c_float)
    lib.pesq862_mos.restype = ctypes.c_double
    lib.pesq862_mos.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def pesq(ref: np.ndarray, deg: np.ndarray, fs: int,
         mode: str = "wb") -> float:
    """MOS-LQO of ``deg`` against ``ref``. fs must be 8000 or 16000;
    mode 'wb' (P.862.2) or 'nb' (P.862.1)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libpesq862.so unavailable (run make -C native)")
    ref = np.ascontiguousarray(ref, np.float32).reshape(-1)
    deg = np.ascontiguousarray(deg, np.float32).reshape(-1)
    n = min(ref.shape[0], deg.shape[0])
    fp = ctypes.POINTER(ctypes.c_float)
    out = lib.pesq862_mos(ref[:n].ctypes.data_as(fp),
                          deg[:n].ctypes.data_as(fp),
                          n, fs, 1 if mode == "wb" else 0)
    if out < 0:
        raise ValueError("pesq862: unsupported input (too short or bad fs)")
    return float(out)
