"""ctypes bindings for the native IO library (vitio.cpp).

The shared library is compiled on demand with g++ and cached next to the
source (keyed on source mtime). All entry points mirror ``io.binfmt`` /
``harness.results`` semantics exactly — the test suite cross-checks the two
implementations byte-for-byte.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "vitio.cpp")
_LIB = os.path.join(_HERE, "libvitio.so")

_lock = threading.Lock()
_cached: Optional["NativeIO"] = None
_build_error: Optional[str] = None


def _build() -> str:
    """Compile vitio.cpp → libvitio.so if missing or stale; returns lib path."""
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"vitio build failed:\n{proc.stderr}")
    return _LIB


class NativeIO:
    """Thin OO wrapper over the C ABI."""

    def __init__(self, lib_path: Optional[str] = None):
        self._lib = ctypes.CDLL(lib_path or _build())
        lib = self._lib
        lib.vitio_last_error.restype = ctypes.c_char_p
        lib.vitio_load_images.restype = ctypes.POINTER(ctypes.c_float)
        lib.vitio_load_images.argtypes = [ctypes.c_char_p,
                                          ctypes.POINTER(ctypes.c_int32)]
        lib.vitio_free.argtypes = [ctypes.c_void_p]
        lib.vitio_load_weights.restype = ctypes.c_int
        lib.vitio_load_weights.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.vitio_write_results.restype = ctypes.c_int
        lib.vitio_write_results.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.vitio_compare_results.restype = ctypes.c_int
        lib.vitio_compare_results.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_float,
        ]

    def _error(self) -> str:
        return self._lib.vitio_last_error().decode()

    def load_images(self, path: str | os.PathLike) -> np.ndarray:
        header = (ctypes.c_int32 * 4)()
        ptr = self._lib.vitio_load_images(str(path).encode(), header)
        if not ptr:
            raise IOError(f"{path}: {self._error()}")
        n, c, h, w = header
        try:
            buf = np.ctypeslib.as_array(ptr, shape=(n * c * h * w,))
            out = buf.reshape(n, c, h, w).copy()
        finally:
            self._lib.vitio_free(ptr)
        return out

    def load_weights(
        self,
        directory: str | os.PathLike,
        count: int,
        *,
        round_to_6dp: bool = True,
        strict: bool = False,
    ) -> Dict[int, np.ndarray]:
        data = (ctypes.POINTER(ctypes.c_float) * count)()
        sizes = (ctypes.c_int64 * count)()
        rc = self._lib.vitio_load_weights(
            str(directory).encode(), count, int(round_to_6dp), int(strict),
            data, sizes,
        )
        try:
            if rc < 0:
                raise IOError(f"{directory}: {self._error()}")
            if rc > 0:
                missing = [i for i in range(count) if not data[i]]
                raise FileNotFoundError(
                    f"{directory}: missing weight indices {missing}"
                )
            out: Dict[int, np.ndarray] = {}
            for i in range(count):
                if data[i]:
                    out[i] = np.ctypeslib.as_array(
                        data[i], shape=(int(sizes[i]),)
                    ).copy()
            return out
        finally:
            for i in range(count):
                if data[i]:
                    self._lib.vitio_free(data[i])

    def write_results(self, path: str | os.PathLike, probs: np.ndarray) -> None:
        probs = np.ascontiguousarray(probs, np.float32)
        n, k = probs.shape
        rc = self._lib.vitio_write_results(str(path).encode(), probs, n, k)
        if rc != 0:
            raise IOError(f"{path}: {self._error()}")

    def compare_results(
        self,
        result_path: str | os.PathLike,
        answer_path: str | os.PathLike,
        *,
        image_count: int = -1,
        prob_tol: float = 0.01,
    ) -> int:
        rc = self._lib.vitio_compare_results(
            str(result_path).encode(), str(answer_path).encode(),
            image_count, prob_tol,
        )
        if rc < 0:
            raise IOError(self._error())
        return rc


def get_native_io() -> Optional[NativeIO]:
    """Build+load the native library; None if the toolchain is unavailable."""
    global _cached, _build_error
    with _lock:
        if _cached is not None:
            return _cached
        if _build_error is not None:
            return None
        try:
            _cached = NativeIO()
        except (RuntimeError, OSError) as e:
            _build_error = str(e)
            return None
        return _cached


def native_available() -> bool:
    return get_native_io() is not None
