"""Native runtime: C++ bounded channels with ctypes bindings.

Builds libmvil_runtime.so on first import (g++, cached next to the source).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmvil_runtime.so")
_SRC = os.path.join(_DIR, "channel.cpp")
_LOCK = threading.Lock()
_LIB = None


def _build():
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", _SO, _SRC,
         "-lpthread"],
        check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.ch_create.restype = ctypes.c_void_p
        lib.ch_create.argtypes = [ctypes.c_uint32, ctypes.c_uint32,
                                  ctypes.c_int]
        lib.ch_destroy.argtypes = [ctypes.c_void_p]
        lib.ch_close.argtypes = [ctypes.c_void_p]
        lib.ch_push.restype = ctypes.c_int
        lib.ch_push.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.c_uint32]
        lib.ch_pop.restype = ctypes.c_int
        lib.ch_pop.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_uint8),
                               ctypes.c_uint32, ctypes.c_int64]
        lib.ch_size.restype = ctypes.c_uint32
        lib.ch_size.argtypes = [ctypes.c_void_p]
        lib.ch_dropped.restype = ctypes.c_uint64
        lib.ch_dropped.argtypes = [ctypes.c_void_p]
        lib.ch_pushed.restype = ctypes.c_uint64
        lib.ch_pushed.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib
