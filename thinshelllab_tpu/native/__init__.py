"""ctypes loader for the native topology builders.

Compiles thinshelllab_tpu/native/topology.cpp to libtsl_topology.so on first
use (g++ -O2 -fPIC -shared); falls back to the pure-Python implementations in
core/topology.py when no compiler is available. Set TSL_NO_NATIVE=1 to force
the Python path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libtsl_topology.so")
_SRC = os.path.join(_DIR, "topology.cpp")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("TSL_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.tsl_cloth_mesh_tables.argtypes = [
        ctypes.c_int, ctypes.c_int, i32p, i32p, i32p, i32p
    ]
    lib.tsl_build_hinges.argtypes = [
        ctypes.c_int, i32p, i32p, i32p, f64p, i32p, i32p, u8p
    ]
    lib.tsl_cube_tets.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
    _lib = lib
    return _lib


def cloth_mesh_tables(N: int, M: int):
    lib = get_lib()
    if lib is None:
        return None
    NF = 2 * N * M
    f2v = np.zeros((NF, 3), np.int32)
    cf = np.zeros((NF, 3), np.int32)
    cp = np.zeros((NF, 3), np.int32)
    indices = np.zeros(NF * 3, np.int32)
    lib.tsl_cloth_mesh_tables(N, M, f2v, cf, cp, indices)
    return f2v, cf, cp, indices


def build_hinges(f2v, cf, cp, init_pos):
    lib = get_lib()
    if lib is None:
        return None
    NF = len(f2v)
    hv = np.zeros((NF * 3, 4), np.int32)
    st = np.zeros((NF * 3, 4), np.int32)
    mask = np.zeros(NF * 3, np.uint8)
    lib.tsl_build_hinges(
        NF,
        np.ascontiguousarray(f2v, np.int32),
        np.ascontiguousarray(cf, np.int32),
        np.ascontiguousarray(cp, np.int32),
        np.ascontiguousarray(init_pos, np.float64),
        hv, st, mask,
    )
    return hv, st, mask.astype(bool)


def cube_tets(nx, ny, nz):
    lib = get_lib()
    if lib is None:
        return None
    n = 5 * (nx - 1) * (ny - 1) * (nz - 1)
    tets = np.zeros((n, 4), np.int32)
    lib.tsl_cube_tets(nx, ny, nz, tets)
    return tets
