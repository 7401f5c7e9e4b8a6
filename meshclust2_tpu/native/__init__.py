"""Native (C++) runtime helpers, bound via ctypes.

Compiled on first use with g++ into a per-user cache directory; falls back
to numpy argsort (stable) when no compiler is available, which loses exact
tie-order parity with the reference but keeps everything functional.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "sortperm.cpp")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build_lib() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "meshclust2_tpu",
    )
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"sortperm_{digest}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)
        except Exception as e:
            print(f"meshclust2_tpu: native sort build failed ({e}); "
                  "falling back to stable numpy sorts", file=sys.stderr)
            return None
    lib = ctypes.CDLL(so)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.sort_perm_u64.argtypes = [ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, i64p]
    lib.sort_perm_f64.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.c_int64, i64p]
    lib.sort_perm_bytes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), i64p, ctypes.c_int64, i64p,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if not _lib_tried:
        _lib = _build_lib()
        _lib_tried = True
    return _lib


def sort_perm(keys: np.ndarray) -> np.ndarray:
    """std::sort-equivalent permutation for numeric keys (unstable tie
    order matching libstdc++)."""
    keys = np.ascontiguousarray(keys)
    n = len(keys)
    perm = np.empty(n, dtype=np.int64)
    lib = _get_lib()
    if lib is None:
        return np.argsort(keys, kind="stable")
    if keys.dtype == np.uint64 or keys.dtype == np.int64:
        k = keys.astype(np.uint64)
        lib.sort_perm_u64(
            k.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            n,
            perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    else:
        k = keys.astype(np.float64)
        lib.sort_perm_f64(
            k.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    return perm


def sort_perm_strings(strings: List[str]) -> np.ndarray:
    """std::sort-equivalent permutation for byte strings."""
    lib = _get_lib()
    n = len(strings)
    if lib is None:
        return np.argsort(np.array(strings, dtype=object), kind="stable").astype(np.int64)
    bufs = [s.encode("utf-8", "surrogateescape") for s in strings]
    offsets = np.zeros(n + 1, dtype=np.int64)
    for i, b in enumerate(bufs):
        offsets[i + 1] = offsets[i] + len(b)
    blob = np.frombuffer(b"".join(bufs), dtype=np.uint8) if bufs else np.zeros(0, np.uint8)
    blob = np.ascontiguousarray(blob)
    if len(blob) == 0:
        blob = np.zeros(1, dtype=np.uint8)
    perm = np.empty(n, dtype=np.int64)
    lib.sort_perm_bytes(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return perm
