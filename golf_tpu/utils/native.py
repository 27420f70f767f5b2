"""Native (C++) host-side DSP dispatch.

The reference leans on C/C++ libraries for host-side work (pyworld's WORLD,
libsoxr, ITU pesq). Here the equivalents live in ``native/worldlite.cpp``
(built to ``native/libworldlite.so`` via ``make -C native``) and are bound
with ctypes; the pure-numpy implementations in
``golf_tpu.utils.world_lite`` are the always-available fallback and the
golden reference for the C++ code's tests.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
from typing import Optional, Tuple

import numpy as np

from . import world_lite

_LIB_PATH = pathlib.Path(__file__).resolve().parents[2] / "native" / \
    "libworldlite.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    dp = ctypes.POINTER(ctypes.c_double)
    lib.wl_dio.restype = None
    lib.wl_dio.argtypes = [dp, ctypes.c_int, ctypes.c_int, ctypes.c_double,
                           ctypes.c_double, ctypes.c_double, dp,
                           ctypes.c_int]
    lib.wl_yin_frame.restype = ctypes.c_double
    lib.wl_resample.restype = ctypes.c_int
    lib.wl_resample.argtypes = [dp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                dp, ctypes.c_int]
    _lib = lib
    return lib


def has_native() -> bool:
    return _load() is not None


def dio(x: np.ndarray, fs: int, f0_floor: float = 65.0,
        f0_ceil: float = 1047.0, frame_period: float = 5.0,
        channels_in_octave: float = 2.0,
        method: str = "dio") -> Tuple[np.ndarray, np.ndarray]:
    """f0 estimation.

    method='dio' (default): the full DIO algorithm (multi-band lowpass
    candidates + stability selection + refinement,
    ``world_lite.dio``) — the fidelity path matching pyworld's dio.
    method='yin': the fast C++ YIN kernel (numpy CMND fallback) for bulk
    data prep.
    """
    x = np.ascontiguousarray(x, np.float64)
    if method == "dio":
        return world_lite.dio(x, fs, f0_floor=f0_floor, f0_ceil=f0_ceil,
                              frame_period=frame_period,
                              channels_in_octave=channels_in_octave)
    lib = _load()
    if lib is None:
        return world_lite.dio_yin(x, fs, f0_floor=f0_floor,
                                  f0_ceil=f0_ceil,
                                  frame_period=frame_period)
    hop = int(fs * frame_period / 1000)
    n_frames = len(x) // hop + 1
    out = np.zeros(n_frames, np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.wl_dio(x.ctypes.data_as(dp), len(x), fs, f0_floor, f0_ceil,
               frame_period, out.ctypes.data_as(dp), n_frames)
    t = np.arange(n_frames) * frame_period / 1000
    return out, t


def resample(x: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """High-quality polyphase resampling; native when built."""
    lib = _load()
    if lib is None or sr == target_sr:
        if sr == target_sr:
            return np.asarray(x, np.float64)
        from math import gcd
        from scipy.signal import resample_poly
        g = gcd(sr, target_sr)
        return resample_poly(np.asarray(x, np.float64),
                             target_sr // g, sr // g)
    x = np.ascontiguousarray(x, np.float64)
    out_len = int(len(x) * target_sr / sr) + 16
    out = np.zeros(out_len, np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    n = lib.wl_resample(x.ctypes.data_as(dp), len(x), sr, target_sr,
                        out.ctypes.data_as(dp), out_len)
    return out[:n]


# re-export the analysis/synthesis trio (numpy implementations; the C++
# path covers the hot f0/resample loops used in bulk data prep)
cheaptrick = world_lite.cheaptrick
d4c = world_lite.d4c
synthesize = world_lite.synthesize
get_f0 = world_lite.get_f0
