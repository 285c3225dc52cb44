"""ctypes binding for the native record store (native/recordio.cpp).

Provides :class:`NativeRecordSource` — a drop-in forcing record source
(same protocol as ArraySource/ZarrSource) backed by mmap'd EFR files with
C++ fused time interpolation and OS prefetch — plus :func:`write_records`
to produce the files.  Builds the shared library on first use if g++ is
available; callers should fall back to the pure-Python sources otherwise.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, Optional

import numpy as np

_MAGIC = 0x31524645
_REPO_NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")

_lib = None


def _build_lib() -> Optional[str]:
    so = os.path.join(_REPO_NATIVE, "librecordio.so")
    src = os.path.join(_REPO_NATIVE, "recordio.cpp")
    if os.path.exists(so) and (not os.path.exists(src) or
                               os.path.getmtime(so) >= os.path.getmtime(src)):
        return so
    if not os.path.exists(src):
        return None
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-std=c++17", "-fPIC",
                        "-pthread", "-shared", src, "-o", so],
                       check=True, capture_output=True)
        return so
    except (OSError, subprocess.CalledProcessError):
        return None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = _build_lib()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.efr_open.restype = ctypes.c_void_p
    lib.efr_open.argtypes = [ctypes.c_char_p]
    lib.efr_info.restype = ctypes.c_int
    lib.efr_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
                             ctypes.POINTER(ctypes.c_uint64),
                             ctypes.POINTER(ctypes.c_int)]
    lib.efr_read.restype = ctypes.c_int
    lib.efr_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                             ctypes.c_void_p]
    lib.efr_interp.restype = ctypes.c_int
    lib.efr_interp.argtypes = [ctypes.c_void_p, ctypes.c_double,
                               ctypes.c_void_p, ctypes.c_int]
    lib.efr_close.restype = None
    lib.efr_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def write_records(root: str, data: Dict[str, np.ndarray]) -> None:
    """Write EFR files (one per variable; record dimension leading)."""
    os.makedirs(root, exist_ok=True)
    for name, arr in data.items():
        a = np.ascontiguousarray(arr)
        if a.dtype == np.float32:
            code = 0
        elif a.dtype == np.float64:
            code = 1
        else:
            a = a.astype(np.float64)
            code = 1
        with open(os.path.join(root, name + ".efr"), "wb") as f:
            f.write(struct.pack("<III", _MAGIC, code, a.ndim))
            f.write(struct.pack(f"<{a.ndim}Q", *a.shape))
            f.write(a.tobytes())


class NativeRecordSource:
    """mmap-backed record source with fused C++ interpolation.

    ``shapes[name]`` restores the per-record array shape (EFR stores it in
    the header; we reread it from the file)."""

    def __init__(self, root: str, nthreads: int = 4):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("librecordio unavailable (no g++?)")
        self.root = root
        self.nthreads = nthreads
        self._handles: Dict[str, int] = {}
        self._meta: Dict[str, tuple] = {}
        for fn in os.listdir(root):
            if not fn.endswith(".efr"):
                continue
            name = fn[:-4]
            path = os.path.join(root, fn)
            h = self.lib.efr_open(path.encode())
            if not h:
                raise IOError(f"bad EFR file {path}")
            nrec = ctypes.c_uint64()
            ne = ctypes.c_uint64()
            dt = ctypes.c_int()
            self.lib.efr_info(h, ctypes.byref(nrec), ctypes.byref(ne),
                              ctypes.byref(dt))
            with open(path, "rb") as f:
                magic, code, ndim = struct.unpack("<III", f.read(12))
                shape = struct.unpack(f"<{ndim}Q", f.read(8 * ndim))
            self._handles[name] = h
            self._meta[name] = (int(nrec.value), shape[1:],
                                np.float32 if dt.value == 0 else np.float64)

    def names(self):
        return list(self._handles.keys())

    def nrec(self, name: str) -> int:
        return self._meta[name][0]

    def read(self, name: str, n: int) -> np.ndarray:
        nrec, shape, dtype = self._meta[name]
        n = min(max(n, 0), nrec - 1)
        out = np.empty(shape, dtype)
        rc = self.lib.efr_read(self._handles[name], n,
                               out.ctypes.data_as(ctypes.c_void_p))
        assert rc == 0
        return out

    def interp(self, name: str, x: float) -> np.ndarray:
        """Fused (1-frac)*rec[n] + frac*rec[n+1] in C++."""
        nrec, shape, dtype = self._meta[name]
        out = np.empty(shape, dtype)
        rc = self.lib.efr_interp(self._handles[name], float(x),
                                 out.ctypes.data_as(ctypes.c_void_p),
                                 self.nthreads)
        assert rc == 0
        return out

    def close(self):
        for h in self._handles.values():
            self.lib.efr_close(h)
        self._handles.clear()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
