"""ctypes binding to the native C++ runtime (built from native/*.cpp).
Falls back gracefully when the shared library is absent."""
from __future__ import annotations

import ctypes
import os
import pathlib

_SO = pathlib.Path(__file__).resolve().parent.parent.parent / "native" / "libmm2tpu.so"
_lib = None


def available() -> bool:
    global _lib
    if _lib is None:
        try:
            _lib = ctypes.CDLL(str(_SO)) if _SO.exists() else False
        except OSError:
            _lib = False
    return bool(_lib)
