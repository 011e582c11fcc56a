"""Native (C++) host-side components, loaded via ctypes.

Built lazily with g++ on first use (no pybind11 in this environment);
every entry point has a pure-Python fallback so the framework works
without a toolchain.  Current components:

* ``sobol_directions(dim)`` — primitive-polynomial search + direction
  number expansion for Sobol sequences (ops/qmc.py), ~100x the Python
  search throughput; required for QMC in thousands of dimensions.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["sobol_directions", "native_available"]

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "sobol.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_probnative.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            ):
                tmp = f"{_SO}.build.{os.getpid()}"
                try:
                    # Build to a temp path and rename: os.replace is atomic,
                    # so a concurrent process can never CDLL a half-written
                    # file.
                    subprocess.run(
                        [
                            "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                            _SRC, "-o", tmp,
                        ],
                        check=True,
                        capture_output=True,
                        timeout=120,
                    )
                    os.replace(tmp, _SO)
                except Exception:
                    # No toolchain (or a failed build): a shipped .so that
                    # merely *looks* stale by mtime is still the right
                    # library to load — fall through to CDLL if it exists.
                    if not os.path.exists(_SO):
                        raise
                finally:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
            lib = ctypes.CDLL(_SO)
            lib.probnative_sobol_directions.argtypes = [
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32),
            ]
            lib.probnative_sobol_directions.restype = ctypes.c_int
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available():
    return _load() is not None


def sobol_directions(dim):
    """(dim, 32) uint32 direction numbers, or None if native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((dim, 32), dtype=np.uint32)
    status = lib.probnative_sobol_directions(
        dim, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    )
    if status != 0:
        return None
    return out
