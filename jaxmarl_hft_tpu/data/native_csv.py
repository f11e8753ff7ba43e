"""ctypes binding for the native LOBSTER CSV parser (native/lobster_csv.cpp).

Drop-in replacement for the pandas read stage of LobsterLoader: returns the
same arrays pandas' C engine produces (times float64, integer columns int64),
so the downstream numpy preprocessing is bit-identical either way. The
shared library is compiled on first use with g++ (cached next to the source,
invalidated on source change); if no toolchain is available the loader
falls back to pandas.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native",
                    "lobster_csv.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "liblobster_csv.so")
_lock = threading.Lock()
_lib = None
_unavailable_reason = None


def build(force: bool = False) -> str:
    """Compile the shared library if missing or stale; returns its path."""
    with _lock:
        fresh = (os.path.exists(_LIB)
                 and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC))
        if force or not fresh:
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-pthread", "-std=c++17", _SRC, "-o", _LIB + ".tmp"]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(_LIB + ".tmp", _LIB)
    return _LIB


def _load():
    global _lib, _unavailable_reason
    if _lib is not None or _unavailable_reason is not None:
        return _lib
    try:
        path = build()
        lib = ctypes.CDLL(path)
        lib.lobster_parse_messages.restype = ctypes.c_int64
        lib.lobster_parse_messages.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
        lib.lobster_parse_book.restype = ctypes.c_int64
        lib.lobster_parse_book.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
        lib.lobster_free.restype = None
        lib.lobster_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except (OSError, subprocess.CalledProcessError) as e:  # no g++ / bad env
        _unavailable_reason = str(e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _copy_and_free(lib, ptr, shape, dtype):
    n = int(np.prod(shape))
    arr = np.ctypeslib.as_array(ptr, shape=(n,))
    out = np.array(arr, dtype=dtype, copy=True).reshape(shape)
    lib.lobster_free(ctypes.cast(ptr, ctypes.c_void_p))
    return out


def parse_messages(path: str) -> np.ndarray:
    """(N, 6) float64 [time, type, order_id, qty, price, direction] — the
    exact array ``pd.read_csv(usecols=range(6)).to_numpy()`` yields (pandas
    upcasts the mixed int/float frame to float64; integer fields here are
    <2^53 so the cast is lossless)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native parser unavailable: {_unavailable_reason}")
    tptr = ctypes.POINTER(ctypes.c_double)()
    iptr = ctypes.POINTER(ctypes.c_int64)()
    n = lib.lobster_parse_messages(path.encode(), ctypes.byref(tptr),
                                   ctypes.byref(iptr))
    if n < 0:
        raise IOError(f"failed to parse {path}")
    times = _copy_and_free(lib, tptr, (n,), np.float64)
    ints = _copy_and_free(lib, iptr, (n, 5), np.int64)
    out = np.empty((n, 6), np.float64)
    out[:, 0] = times
    out[:, 1:] = ints
    return out


def parse_book(path: str) -> np.ndarray:
    """(N, ncols) int64 orderbook snapshot array."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native parser unavailable: {_unavailable_reason}")
    ncols = ctypes.c_int32(0)
    ptr = ctypes.POINTER(ctypes.c_int64)()
    n = lib.lobster_parse_book(path.encode(), ctypes.byref(ncols),
                               ctypes.byref(ptr))
    if n < 0:
        raise IOError(f"failed to parse {path}")
    return _copy_and_free(lib, ptr, (n, ncols.value), np.int64)
