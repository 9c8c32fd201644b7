"""ctypes bindings for the C++ native oracle (imt_native.cpp).

Builds the shared library on first use (g++ -O2, no external deps) and
exposes batched hash2/hash3/mul/add/tree-build over numpy uint64 arrays.
Field elements cross the boundary as 4x64-bit little-endian limbs in
standard (non-Montgomery) form.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..ops import field
from ..ops.poseidon_ref import generate_params

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "imt_native.cpp")
_LIB = os.path.join(_DIR, "libimt_native.so")

_lib = None


def _build() -> None:
    cmd = ["g++", "-O2", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.imt_init.argtypes = [u64p, u64p, ctypes.c_int, ctypes.c_int]
    for name, nargs in [("imt_hash2", 3), ("imt_mul_mod", 3),
                        ("imt_add_mod", 3), ("imt_hash3", 4)]:
        getattr(lib, name).argtypes = [u64p] * nargs + [ctypes.c_long]
    lib.imt_tree_build.argtypes = [u64p, u64p, ctypes.c_long]

    params = generate_params()
    rc = np.zeros((params.n_rounds * params.t, 4), dtype=np.uint64)
    for r in range(params.n_rounds):
        for i in range(params.t):
            rc[r * params.t + i] = _int_to_u64(params.round_constants[r][i])
    mds = np.zeros((params.t * params.t, 4), dtype=np.uint64)
    for i in range(params.t):
        for j in range(params.t):
            mds[i * params.t + j] = _int_to_u64(params.mds[i][j])
    lib.imt_init(_ptr(rc), _ptr(mds), params.r_f, params.r_p)
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _int_to_u64(x: int) -> np.ndarray:
    return np.array([(x >> (64 * i)) & ((1 << 64) - 1) for i in range(4)],
                    dtype=np.uint64)


def ints_to_u64(xs) -> np.ndarray:
    out = np.zeros((len(xs), 4), dtype=np.uint64)
    for i, x in enumerate(xs):
        out[i] = _int_to_u64(x % field.P)
    return out


def u64_to_ints(a: np.ndarray) -> list[int]:
    a = np.ascontiguousarray(a, dtype=np.uint64)
    return [sum(int(row[i]) << (64 * i) for i in range(4)) for row in a]


def hash2(xs, ys) -> list[int]:
    lib = _load()
    a, b = ints_to_u64(xs), ints_to_u64(ys)
    out = np.zeros_like(a)
    lib.imt_hash2(_ptr(a), _ptr(b), _ptr(out), len(xs))
    return u64_to_ints(out)


def hash3(xs, ys, zs) -> list[int]:
    lib = _load()
    a, b, c = ints_to_u64(xs), ints_to_u64(ys), ints_to_u64(zs)
    out = np.zeros_like(a)
    lib.imt_hash3(_ptr(a), _ptr(b), _ptr(c), _ptr(out), len(xs))
    return u64_to_ints(out)


def mul_mod(xs, ys) -> list[int]:
    lib = _load()
    a, b = ints_to_u64(xs), ints_to_u64(ys)
    out = np.zeros_like(a)
    lib.imt_mul_mod(_ptr(a), _ptr(b), _ptr(out), len(xs))
    return u64_to_ints(out)


def add_mod(xs, ys) -> list[int]:
    lib = _load()
    a, b = ints_to_u64(xs), ints_to_u64(ys)
    out = np.zeros_like(a)
    lib.imt_add_mod(_ptr(a), _ptr(b), _ptr(out), len(xs))
    return u64_to_ints(out)


def tree_build(leaves) -> list[int]:
    """All tree levels (leaves first, root last) for 2^k leaves."""
    lib = _load()
    n = len(leaves)
    a = ints_to_u64(leaves)
    out = np.zeros((2 * n - 1, 4), dtype=np.uint64)
    lib.imt_tree_build(_ptr(a), _ptr(out), n)
    return u64_to_ints(out)


# --- raw-array fast paths (no python-int conversion) -------------------------

def hash2_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.uint64)
    b = np.ascontiguousarray(b, np.uint64)
    out = np.zeros_like(a)
    lib.imt_hash2(_ptr(a), _ptr(b), _ptr(out), a.shape[0])
    return out
