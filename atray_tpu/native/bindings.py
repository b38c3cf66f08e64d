"""ctypes bindings for the native host components (atray_native.cpp).

Built on demand with the system C++ compiler (g++ -O2 -shared); all callers
fall back to the numpy implementations when the toolchain or library is
unavailable, so the native path is a pure accelerator, never a dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "atray_native.cpp")
_LIB = os.path.join(_DIR, "libatray_native.so")
_STAMP = _LIB + ".srchash"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _src_hash() -> str:
    with open(_SRC, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def _stale() -> bool:
    """Rebuild keyed on a source HASH, not mtimes: git checkouts set both
    mtimes to checkout time, so a stale committed binary could silently
    shadow newer C++ under mtime comparison (ADVICE r1)."""
    if not os.path.exists(_LIB):
        return True
    try:
        with open(_STAMP) as fh:
            return fh.read().strip() != _src_hash()
    except OSError:
        return True


class _BvhOut(ctypes.Structure):
    _fields_ = [
        ("node_min", ctypes.POINTER(ctypes.c_float)),
        ("node_max", ctypes.POINTER(ctypes.c_float)),
        ("node_miss", ctypes.POINTER(ctypes.c_int32)),
        ("leaf_start", ctypes.POINTER(ctypes.c_int32)),
        ("tri_p0", ctypes.POINTER(ctypes.c_float)),
        ("tri_e1", ctypes.POINTER(ctypes.c_float)),
        ("tri_e2", ctypes.POINTER(ctypes.c_float)),
        ("tri_id", ctypes.POINTER(ctypes.c_int32)),
        ("num_nodes", ctypes.c_int64),
        ("num_slots", ctypes.c_int64),
    ]


class _ObjOut(ctypes.Structure):
    _fields_ = [
        ("verts", ctypes.POINTER(ctypes.c_float)),
        ("norms", ctypes.POINTER(ctypes.c_float)),
        ("texs", ctypes.POINTER(ctypes.c_float)),
        ("faces", ctypes.POINTER(ctypes.c_int32)),
        ("fnidx", ctypes.POINTER(ctypes.c_int32)),
        ("ftidx", ctypes.POINTER(ctypes.c_int32)),
        ("nverts", ctypes.c_int64),
        ("nnorms", ctypes.c_int64),
        ("ntexs", ctypes.c_int64),
        ("nfaces", ctypes.c_int64),
    ]


def ensure_built(force: bool = False) -> bool:
    """Compile the shared library if needed. Returns availability."""
    global _lib, _tried
    if _lib is not None and not force:
        return True
    if _tried and not force:
        return _lib is not None
    _tried = True
    try:
        if force or _stale():
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
                 "-o", _LIB],
                check=True, capture_output=True, timeout=120,
            )
            with open(_STAMP, "w") as fh:
                fh.write(_src_hash())
        lib = ctypes.CDLL(_LIB)
        lib.atray_build_bvh.restype = ctypes.c_int
        lib.atray_parse_obj.restype = ctypes.c_int
        lib.atray_free.restype = None
        lib.atray_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return True
    except Exception:
        _lib = None
        return False


def available() -> bool:
    return ensure_built()


def _take(ptr, count, dtype):
    """Copy a malloc'd buffer into numpy and free it."""
    arr = np.ctypeslib.as_array(ptr, shape=(count,)).copy()
    return arr.astype(dtype, copy=False)


def build_bvh_native(vertices, faces, leaf_size: int, sah_bins: int,
                     max_depth: int):
    """Native BVH build -> dict of flat arrays (accel/bvh.py layout), or
    None when the native library is unavailable."""
    if not ensure_built():
        return None
    v = np.ascontiguousarray(np.asarray(vertices, np.float32))
    f = np.ascontiguousarray(np.asarray(faces, np.int32))
    out = _BvhOut()
    rc = _lib.atray_build_bvh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(v.shape[0]),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(f.shape[0]),
        ctypes.c_int(leaf_size), ctypes.c_int(sah_bins),
        ctypes.c_int(max_depth), ctypes.byref(out),
    )
    if rc != 0:
        return None
    k = out.num_nodes
    l = out.num_slots
    result = dict(
        node_min=_take(out.node_min, 3 * k, np.float32).reshape(k, 3),
        node_max=_take(out.node_max, 3 * k, np.float32).reshape(k, 3),
        node_miss=_take(out.node_miss, k, np.int32),
        leaf_start=_take(out.leaf_start, k, np.int32),
        tri_p0=_take(out.tri_p0, 3 * l, np.float32).reshape(l, 3),
        tri_e1=_take(out.tri_e1, 3 * l, np.float32).reshape(l, 3),
        tri_e2=_take(out.tri_e2, 3 * l, np.float32).reshape(l, 3),
        tri_orig_id=_take(out.tri_id, l, np.int32),
    )
    for ptr in (out.node_min, out.node_max, out.node_miss, out.leaf_start,
                out.tri_p0, out.tri_e1, out.tri_e2, out.tri_id):
        _lib.atray_free(ctypes.cast(ptr, ctypes.c_void_p))
    return result


def parse_obj_native(path: str):
    """Native OBJ parse -> dict of arrays, or None if unavailable/failed."""
    if not ensure_built():
        return None
    out = _ObjOut()
    rc = _lib.atray_parse_obj(path.encode(), ctypes.byref(out))
    if rc != 0:
        return None
    result = dict(
        vertices=_take(out.verts, 3 * max(out.nverts, 1), np.float32)
        .reshape(-1, 3)[: out.nverts],
        normals=_take(out.norms, 3 * max(out.nnorms, 1), np.float32)
        .reshape(-1, 3)[: out.nnorms],
        tex_coords=_take(out.texs, 2 * max(out.ntexs, 1), np.float32)
        .reshape(-1, 2)[: out.ntexs],
        faces=_take(out.faces, 3 * max(out.nfaces, 1), np.int32)
        .reshape(-1, 3)[: out.nfaces],
        face_normal_idx=_take(out.fnidx, 3 * max(out.nfaces, 1), np.int32)
        .reshape(-1, 3)[: out.nfaces],
        face_tex_idx=_take(out.ftidx, 3 * max(out.nfaces, 1), np.int32)
        .reshape(-1, 3)[: out.nfaces],
    )
    for ptr in (out.verts, out.norms, out.texs, out.faces, out.fnidx,
                out.ftidx):
        _lib.atray_free(ctypes.cast(ptr, ctypes.c_void_p))
    return result
