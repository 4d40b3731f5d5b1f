"""ctypes bindings for the C++ loader core (gaviko_tpu/native/loader_core.cpp).

Builds the shared library on first use with the baked-in g++ toolchain and
caches it next to the source. Falls back to numpy transparently when no
compiler is available, so the framework never hard-depends on the native
path (gaviko_tpu/data/transforms.py uses whichever is active).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "loader_core.cpp")
_SO = os.path.join(_NATIVE_DIR, "libloader_core.so")

_lock = threading.Lock()
_lib = None
_tried = False

DEFAULT_THREADS = min(8, os.cpu_count() or 1)


def _build() -> bool:
    # Portable codegen only: the .so is built lazily on each host (never
    # committed), and -march=native binaries would SIGILL when the build
    # host's ISA differs from the run host's.
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # noqa: BLE001 - fall back to numpy
        logging.info(f"native loader build unavailable ({e}); using numpy")
        return False


def _self_test(lib) -> bool:
    """One-time numerical sanity check before enabling the native path."""
    try:
        x = np.asarray([[-1.0, 0.5], [2.0, 3.0]], dtype=np.float32)
        mn = ctypes.c_float()
        mx = ctypes.c_float()
        lib.volume_minmax_f32(x.ctypes.data, x.size, 2,
                              ctypes.byref(mn), ctypes.byref(mx))
        if mn.value != -1.0 or mx.value != 3.0:
            return False
        out = np.empty_like(x)
        lib.rescale_f32(x.ctypes.data, out.ctypes.data, x.size,
                        mn.value, 1.0 / (mx.value - mn.value), 0.0, 2)
        expected = (x - mn.value) / (mx.value - mn.value)
        return bool(np.allclose(out, expected, atol=1e-6))
    except Exception:  # noqa: BLE001
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.volume_minmax_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
            lib.rescale_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ]
            lib.widen_i16_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_int,
            ]
            lib.widen_u16_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_int,
            ]
            if not _self_test(lib):
                logging.info("native loader self-test failed; using numpy")
                lib = None
            _lib = lib
        except OSError as e:
            logging.info(f"native loader load failed ({e}); using numpy")
            _lib = None
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def rescale_intensity_native(
    x: np.ndarray, out_min: float = 0.0, out_max: float = 1.0,
    nthreads: int = DEFAULT_THREADS,
) -> np.ndarray:
    """Min-max rescale via the C++ core; semantics identical to
    transforms.rescale_intensity."""
    lib = get_lib()
    x = np.ascontiguousarray(x, dtype=np.float32)
    if lib is None:
        lo, hi = float(x.min()), float(x.max())
        if hi == lo:
            return np.zeros_like(x) + out_min
        return (x - lo) / (hi - lo) * (out_max - out_min) + out_min
    n = x.size
    mn = ctypes.c_float()
    mx = ctypes.c_float()
    lib.volume_minmax_f32(x.ctypes.data, n, nthreads,
                          ctypes.byref(mn), ctypes.byref(mx))
    lo, hi = mn.value, mx.value
    out = np.empty_like(x)
    if hi == lo:
        out[...] = out_min
        return out
    scale = (out_max - out_min) / (hi - lo)
    lib.rescale_f32(x.ctypes.data, out.ctypes.data, n, lo, scale, out_min,
                    nthreads)
    return out


def widen_f32(x: np.ndarray, nthreads: int = DEFAULT_THREADS) -> np.ndarray:
    """dtype-widen a volume to float32; int16/uint16 (the common raw MRI
    dtypes) take the multithreaded C++ path, everything else numpy astype.
    Always returns a fresh contiguous array (callers may mutate)."""
    lib = get_lib()
    if lib is not None and x.dtype in (np.int16, np.uint16) \
            and x.flags["C_CONTIGUOUS"]:
        out = np.empty(x.shape, np.float32)
        fn = lib.widen_i16_f32 if x.dtype == np.int16 else lib.widen_u16_f32
        fn(x.ctypes.data, out.ctypes.data, x.size, nthreads)
        return out
    return x.astype(np.float32)  # astype copies, matching the native path
