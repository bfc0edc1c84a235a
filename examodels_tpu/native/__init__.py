"""Native (C++) host runtime: data loading + build-time sparsity planning.

The TPU compute path is XLA/Pallas; this package is the compiled host layer
around it — the analogue of the reference's reliance on compiled Julia and
the ExaPowerIO.jl loader. The C++ source (exa_native.cpp) is compiled once
per source hash with the system g++ into a cached shared object and bound
via ctypes; every entry point has a NumPy fallback so the package works
without a toolchain (EXAMODELS_TPU_NO_NATIVE=1 forces the fallback).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "native_lib",
    "native_available",
    "parse_matpower_text",
    "coo_compress_plan",
    "segment_bounds",
]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _default_cache_dir() -> Path:
    """User-owned 0700 cache dir. A world-writable tempdir would let another
    local user pre-plant a .so at the predictable hash path that CDLL then
    executes in-process; an owned private directory closes that."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    if not os.path.isabs(base):  # e.g. HOME unset -> '~' literal
        base = os.path.join(tempfile.gettempdir(), f"exa_cache_{os.getuid()}")
    d = Path(base) / "examodels_tpu"
    d.mkdir(mode=0o700, parents=True, exist_ok=True)
    return d


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = Path(__file__).with_name("exa_native.cpp")
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    env_dir = os.environ.get("EXAMODELS_TPU_NATIVE_CACHE")
    cache_dir = Path(env_dir) if env_dir else _default_cache_dir()
    out = cache_dir / f"exa_native_{tag}.so"
    if out.exists():
        st = out.stat()
        if st.st_uid != os.getuid() or (st.st_mode & 0o022):
            # not ours / group+other writable: refuse to load, rebuild fresh
            out = cache_dir / f"exa_native_{tag}_{os.getuid()}.so"
    if not out.exists():
        tmp = out.with_suffix(f".{os.getpid()}.tmp")
        cmd = [
            "g++", "-std=c++17", "-O3", "-shared", "-fPIC",
            str(src), "-o", str(tmp),
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)  # atomic: concurrent builders race benignly
    lib = ctypes.CDLL(str(out))

    lib.mp_parse.restype = ctypes.c_void_p
    lib.mp_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.mp_matrix_meta.restype = ctypes.c_int32
    lib.mp_matrix_meta.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mp_matrix_copy.restype = ctypes.c_int32
    lib.mp_matrix_copy.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
    ]
    lib.mp_base_mva.restype = ctypes.c_double
    lib.mp_base_mva.argtypes = [ctypes.c_void_p]
    lib.mp_free.restype = None
    lib.mp_free.argtypes = [ctypes.c_void_p]

    lib.coo_compress_plan.restype = ctypes.c_int64
    lib.coo_compress_plan.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.segment_bounds.restype = None
    lib.segment_bounds.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def native_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (toolchain missing / disabled)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("EXAMODELS_TPU_NO_NATIVE"):
        return None
    try:
        _LIB = _build_and_load()
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return native_lib() is not None


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


# ---------------------------------------------------------------------------
# MATPOWER parsing
# ---------------------------------------------------------------------------


def parse_matpower_text(text: str) -> Optional[dict]:
    """Parse MATPOWER case text into {name: (rows, cols) float64 matrix}
    plus float entry 'baseMVA'. Returns None when the native library is
    unavailable (callers fall back to the Python parser)."""
    lib = native_lib()
    if lib is None:
        return None
    raw = text.encode()
    handle = lib.mp_parse(raw, len(raw))
    try:
        out: dict = {"baseMVA": float(lib.mp_base_mva(handle))}
        for name in ("bus", "gen", "branch", "gencost", "dcline"):
            r = ctypes.c_int64()
            c = ctypes.c_int64()
            if lib.mp_matrix_meta(handle, name.encode(), ctypes.byref(r), ctypes.byref(c)) != 0:
                continue
            m = np.empty((r.value, c.value), dtype=np.float64)
            lib.mp_matrix_copy(
                handle, name.encode(),
                m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
            out[name] = m
        return out
    finally:
        lib.mp_free(handle)


# ---------------------------------------------------------------------------
# Build-time sparsity planning (NumPy fallbacks kept in lockstep)
# ---------------------------------------------------------------------------


def coo_compress_plan(rows, cols):
    """(perm, seg, urows, ucols): stable sort by (row, col), unique
    coordinates, per-entry segment ids. Native C++ when available, NumPy
    lexsort otherwise (parity: the sort/ptr build of
    /root/reference/src/utils.jl:425-512)."""
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    n = rows.shape[0]
    lib = native_lib()
    if lib is not None and n:
        perm = np.empty(n, dtype=np.int32)
        seg = np.empty(n, dtype=np.int32)
        urows = np.empty(n, dtype=np.int32)
        ucols = np.empty(n, dtype=np.int32)
        nu = lib.coo_compress_plan(
            _i64p(rows), _i64p(cols), n,
            _i32p(perm), _i32p(seg), _i32p(urows), _i32p(ucols),
        )
        return perm, seg, urows[:nu].copy(), ucols[:nu].copy()
    if n == 0:
        z32 = np.zeros(0, dtype=np.int32)
        return z32, z32.copy(), z32.copy(), z32.copy()
    key = rows * (cols.max() + 1) + cols
    perm = np.argsort(key, kind="stable")
    sk = key[perm]
    uniq_mask = np.concatenate([[True], sk[1:] != sk[:-1]])
    seg = np.cumsum(uniq_mask) - 1
    return (
        perm.astype(np.int32),
        seg.astype(np.int32),
        rows[perm][uniq_mask].astype(np.int32),
        cols[perm][uniq_mask].astype(np.int32),
    )


def segment_bounds(sorted_targets, num_segments: int) -> np.ndarray:
    """CSR-style boundaries of sorted non-negative target ids."""
    sorted_targets = np.ascontiguousarray(sorted_targets, dtype=np.int64)
    n = sorted_targets.shape[0]
    lib = native_lib()
    if lib is not None:
        bounds = np.empty(num_segments + 1, dtype=np.int32)
        lib.segment_bounds(_i64p(sorted_targets), n, num_segments, _i32p(bounds))
        return bounds
    return np.searchsorted(
        sorted_targets, np.arange(num_segments + 1)
    ).astype(np.int32)
