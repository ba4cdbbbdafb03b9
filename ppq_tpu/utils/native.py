"""Native C++ solver library: on-demand build + ctypes bindings
(replaces the reference's torch cpp_extension JIT loader, core/ffi.py:16-53;
pybind11 is unavailable in this image, so the ABI is plain extern "C").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..core import ppq_warning

_lock = threading.Lock()
_lib_cache: Optional['NativeSolvers'] = None
_build_failed = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'csrc', 'solvers.cc')
_BUILD_DIR = os.path.join(os.path.dirname(_SRC), 'build')
_SO = os.path.join(_BUILD_DIR, 'libppq_tpu_solvers.so')


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


class NativeSolvers:
    def __init__(self, path: str):
        lib = ctypes.CDLL(path)
        lib.kl_search.restype = ctypes.c_int
        lib.kl_search.argtypes = [ctypes.POINTER(ctypes.c_double),
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.mse_search.restype = ctypes.c_int
        lib.mse_search.argtypes = [ctypes.POINTER(ctypes.c_double),
                                   ctypes.c_int, ctypes.c_double,
                                   ctypes.c_int, ctypes.c_int]
        lib.isotone_solve.restype = None
        lib.isotone_solve.argtypes = [ctypes.POINTER(ctypes.c_double),
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_double)]
        lib.compute_mse_loss.restype = ctypes.c_double
        lib.compute_mse_loss.argtypes = [ctypes.POINTER(ctypes.c_double),
                                         ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int]
        self._lib = lib

    @staticmethod
    def _ptr(arr: np.ndarray):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    def kl_search(self, hist: np.ndarray, levels: int, interval: int) -> int:
        hist = np.ascontiguousarray(hist, np.float64)
        return self._lib.kl_search(self._ptr(hist), len(hist),
                                   levels, interval)

    def mse_search(self, hist: np.ndarray, hist_scale: float, levels: int,
                   interval: int) -> int:
        hist = np.ascontiguousarray(hist, np.float64)
        return self._lib.mse_search(self._ptr(hist), len(hist),
                                    float(hist_scale), levels, interval)

    def isotone(self, values: np.ndarray) -> np.ndarray:
        values = np.ascontiguousarray(values, np.float64)
        out = np.empty_like(values)
        self._lib.isotone_solve(self._ptr(values), len(values),
                                self._ptr(out))
        return out

    def compute_mse_loss(self, hist: np.ndarray, start: int, step: int,
                         end: int) -> float:
        hist = np.ascontiguousarray(hist, np.float64)
        return self._lib.compute_mse_loss(self._ptr(hist), len(hist),
                                          start, step, end)


def native_solvers() -> Optional[NativeSolvers]:
    """Build-once, cached loader. Returns None when the toolchain is
    unavailable (callers fall back to numpy)."""
    global _lib_cache, _build_failed
    if _lib_cache is not None:
        return _lib_cache
    if _build_failed:
        return None
    with _lock:
        if _lib_cache is not None:
            return _lib_cache
        try:
            _lib_cache = NativeSolvers(_build())
        except Exception as e:
            _build_failed = True
            ppq_warning(f'native solver build failed ({e}); '
                        f'falling back to numpy solvers.')
            return None
    return _lib_cache
