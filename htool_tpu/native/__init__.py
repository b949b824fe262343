"""Native planner bindings: compile-on-first-use C++ planner via ctypes.

The planner (cluster tree + block tree) is the framework's graph-builder —
the role the reference implements in C++ headers (clustering/ and
hmatrix/tree_builder/).  It is built lazily with g++ into the package dir
and loaded through ctypes; all callers gracefully fall back to the NumPy
implementations when unavailable (``native_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["native_available", "get_lib", "ct_build_native", "bt_plan_native"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "planner.cpp")
_SO = os.path.join(_HERE, "libplanner.so")
_lock = threading.Lock()
_lib = None
_failed = False

_I64 = ctypes.POINTER(ctypes.c_int64)
_F64 = ctypes.POINTER(ctypes.c_double)


def _compile() -> bool:
    try:
        src_m = os.path.getmtime(_SRC)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_m:
            return True
        cmd = [
            "g++",
            "-O3",
            "-std=c++17",
            "-shared",
            "-fPIC",
            _SRC,
            "-o",
            _SO + ".tmp",
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def _setup(lib):
    lib.ct_build.restype = ctypes.c_void_p
    lib.ct_build.argtypes = [
        ctypes.c_int64,
        ctypes.c_int,
        _F64,
        _F64,
        _F64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        _I64,
        ctypes.c_int,
    ]
    lib.ct_n_nodes.restype = ctypes.c_int64
    lib.ct_n_nodes.argtypes = [ctypes.c_void_p]
    lib.ct_n_children_total.restype = ctypes.c_int64
    lib.ct_n_children_total.argtypes = [ctypes.c_void_p]
    lib.ct_is_permutation_local.restype = ctypes.c_int
    lib.ct_is_permutation_local.argtypes = [ctypes.c_void_p]
    lib.ct_fill.restype = None
    lib.ct_fill.argtypes = [ctypes.c_void_p] + [_I64] * 11 + [_F64, _F64]
    lib.ct_free.argtypes = [ctypes.c_void_p]

    lib.bt_plan.restype = ctypes.c_void_p
    lib.bt_plan.argtypes = (
        [_I64] * 8
        + [_F64, _F64, ctypes.c_int64, ctypes.c_int64]
        + [_I64] * 8
        + [_F64, _F64, ctypes.c_int64, ctypes.c_int64]
        + [
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
    )
    lib.bt_n_dense.restype = ctypes.c_int64
    lib.bt_n_dense.argtypes = [ctypes.c_void_p]
    lib.bt_n_admissible.restype = ctypes.c_int64
    lib.bt_n_admissible.argtypes = [ctypes.c_void_p]
    lib.bt_fill.restype = None
    lib.bt_fill.argtypes = [ctypes.c_void_p, _I64, _I64]
    lib.bt_free.argtypes = [ctypes.c_void_p]


def get_lib():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _compile():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
            _setup(lib)
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def _i64p(a):
    return a.ctypes.data_as(_I64)


def _f64p(a):
    return a.ctypes.data_as(_F64)


def ct_build_native(
    points: np.ndarray,
    max_leaf_size: int,
    n_children: int,
    direction: str,
    splitting: str,
    n_partitions: int,
    partition,
    is_partition_local: bool,
    radii,
    weights,
):
    """Run the native cluster-tree builder; returns the flat arrays dict
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n, dim = pts.shape
    rad = None if radii is None else np.ascontiguousarray(radii, np.float64)
    wts = None if weights is None else np.ascontiguousarray(weights, np.float64)
    part = (
        None
        if partition is None
        else np.ascontiguousarray(np.asarray(partition).reshape(-1), np.int64)
    )
    h = lib.ct_build(
        n,
        dim,
        _f64p(pts),
        _f64p(rad) if rad is not None else None,
        _f64p(wts) if wts is not None else None,
        max_leaf_size,
        n_children,
        0 if direction == "pca" else 1,
        0 if splitting == "regular" else 1,
        n_partitions,
        _i64p(part) if part is not None else None,
        1 if is_partition_local else 0,
    )
    try:
        nn = lib.ct_n_nodes(h)
        nc = lib.ct_n_children_total(h)
        out = dict(
            permutation=np.empty(n, np.int64),
            offsets=np.empty(nn, np.int64),
            sizes=np.empty(nn, np.int64),
            depths=np.empty(nn, np.int64),
            parents=np.empty(nn, np.int64),
            child_start=np.empty(nn, np.int64),
            child_count=np.empty(nn, np.int64),
            children=np.empty(max(nc, 1), np.int64),
            ranks=np.empty(nn, np.int64),
            counters=np.empty(nn, np.int64),
            partition_roots=np.empty(max(n_partitions, 1), np.int64),
            centers=np.empty((nn, dim), np.float64),
            radii=np.empty(nn, np.float64),
        )
        lib.ct_fill(
            h,
            _i64p(out["permutation"]),
            _i64p(out["offsets"]),
            _i64p(out["sizes"]),
            _i64p(out["depths"]),
            _i64p(out["parents"]),
            _i64p(out["child_start"]),
            _i64p(out["child_count"]),
            _i64p(out["children"]),
            _i64p(out["ranks"]),
            _i64p(out["counters"]),
            _i64p(out["partition_roots"]),
            _f64p(out["centers"]),
            _f64p(out["radii"]),
        )
        out["children"] = out["children"][:nc]
        out["is_permutation_local"] = bool(lib.ct_is_permutation_local(h))
        return out
    finally:
        lib.ct_free(h)


def _tree_view_args(tree):
    arrs = [
        np.ascontiguousarray(tree.offsets, np.int64),
        np.ascontiguousarray(tree.sizes, np.int64),
        np.ascontiguousarray(tree.depths, np.int64),
        np.ascontiguousarray(tree.child_start, np.int64),
        np.ascontiguousarray(tree.child_count, np.int64),
        np.ascontiguousarray(
            tree.children if tree.children.size else np.zeros(1, np.int64),
            np.int64,
        ),
        np.ascontiguousarray(tree.ranks, np.int64),
        np.ascontiguousarray(tree.partition_roots, np.int64),
    ]
    f = [
        np.ascontiguousarray(tree.centers, np.float64),
        np.ascontiguousarray(tree.radii, np.float64),
    ]
    args = [_i64p(a) for a in arrs] + [_f64p(a) for a in f]
    args += [tree.n_nodes, tree.n_partitions]
    return args, arrs + f  # keep refs alive


def bt_plan_native(
    target_tree,
    source_tree,
    eta: float,
    symmetry: str,
    UPLO: str,
    target_partition: int,
    min_target_depth: int,
    min_source_depth: int,
    consistency: bool,
    leaf_level,
    partition_number_for_symmetry: int = -1,
):
    """Run the native block-tree planner; returns (dense, admissible)
    [n, 7] int64 arrays or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ta, tkeep = _tree_view_args(target_tree)
    sa, skeep = _tree_view_args(source_tree)
    sym = {"N": 0, "S": 1, "H": 2}[symmetry]
    up = {"N": 0, "L": 1, "U": 2}[UPLO]
    h = lib.bt_plan(
        *ta,
        *sa,
        int(target_tree.dim),
        float(eta),
        sym,
        up,
        int(target_partition),
        int(min_target_depth),
        int(min_source_depth),
        1 if consistency else 0,
        -1 if leaf_level is None else int(leaf_level),
        int(partition_number_for_symmetry),
    )
    try:
        nd = lib.bt_n_dense(h)
        na = lib.bt_n_admissible(h)
        dense = np.empty((max(nd, 1), 7), np.int64)
        adm = np.empty((max(na, 1), 7), np.int64)
        lib.bt_fill(h, _i64p(dense), _i64p(adm))
        return dense[:nd], adm[:na]
    finally:
        lib.bt_free(h)
