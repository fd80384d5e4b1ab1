"""Bindings to the native C++ host runtime, with Python fallbacks.

The reference implements its host-side heavy lifting (OBJ parsing, BVH
construction) in C++ (src/obj_read.cu, src/objects.cu:602-770); we do the
same in ``runtime/native/host_runtime.cpp`` exposed through a C ABI + ctypes.
Every entry point has a pure-Python fallback so the framework works before
the shared library is built; ``build_native()`` compiles it on demand.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libraytracer_host.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def build_native(force: bool = False) -> bool:
    """Compile the native host runtime. Returns True on success."""
    src = os.path.join(_NATIVE_DIR, "host_runtime.cpp")
    if not os.path.exists(src):
        return False
    if os.path.exists(_LIB_PATH) and not force:
        return True
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        if not build_native():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rt_parse_obj.restype = ctypes.c_int
        lib.rt_parse_obj.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,   # vertices out, cap
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,     # face idx out, cap
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,     # face sizes out, cap
            ctypes.POINTER(ctypes.c_int),                   # counts out (3)
        ]
        lib.rt_build_bvh.restype = ctypes.c_int
        lib.rt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,   # tri verts (T*9), T
            ctypes.c_int,                                   # leaf size
            ctypes.POINTER(ctypes.c_int),                   # order out (T)
            ctypes.POINTER(ctypes.c_float),                 # node bounds out (2N*6)
            ctypes.POINTER(ctypes.c_int),                   # node meta out (2N*4)
            ctypes.POINTER(ctypes.c_int),                   # num nodes out
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def parse_obj(path: str) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Parse an OBJ file; native C++ when available, Python otherwise."""
    lib = _get_lib()
    if lib is None:
        from ..models.obj_loader import parse_obj_python
        return parse_obj_python(path)

    # Generous fixed caps; the native call reports real counts.
    v_cap, f_cap = 4_000_000, 4_000_000
    verts = np.zeros(v_cap * 3, np.float32)
    fidx = np.zeros(f_cap * 4, np.int32)
    fsize = np.zeros(f_cap, np.int32)
    counts = np.zeros(3, np.int32)
    rc = lib.rt_parse_obj(
        path.encode(),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v_cap,
        fidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), f_cap * 4,
        fsize.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), f_cap,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        raise FileNotFoundError(f"Could not parse OBJ file: {path}")
    nv, nf, _ = counts
    vertices = verts[: nv * 3].reshape(nv, 3).copy()
    faces = []
    off = 0
    for i in range(nf):
        k = fsize[i]
        faces.append(fidx[off : off + k].copy())
        off += k
    return vertices, faces


def build_bvh_clusters(tri_verts: np.ndarray, leaf_size: int = 64):
    """Median-split BVH over triangles; returns (order, node_bounds, node_meta).

    ``tri_verts`` is (T, 3, 3). ``order`` is a permutation of triangle
    indices so each leaf's triangles are contiguous; ``node_bounds`` is
    (num_nodes, 6) [min, max]; ``node_meta`` is (num_nodes, 4)
    [left, right, start, count] with left == -1 marking leaves.

    Native C++ when available (mirroring the reference's host build,
    src/objects.cu:602-770, but with longest-axis midpoint splits and proper
    leaf-only triangle storage — see SURVEY.md quirk #15).
    """
    t = int(tri_verts.shape[0])
    if t == 0:
        return (np.zeros(0, np.int32), np.zeros((1, 6), np.float32),
                np.array([[-1, -1, 0, 0]], np.int32))

    lib = _get_lib()
    if lib is not None:
        flat = np.ascontiguousarray(tri_verts.reshape(t, 9), np.float32)
        order = np.zeros(t, np.int32)
        max_nodes = 4 * t + 2
        bounds = np.zeros((max_nodes, 6), np.float32)
        meta = np.zeros((max_nodes, 4), np.int32)
        n_nodes = np.zeros(1, np.int32)
        rc = lib.rt_build_bvh(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t,
            int(leaf_size),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        if rc == 0:
            n = int(n_nodes[0])
            return order, bounds[:n].copy(), meta[:n].copy()

    return _build_bvh_python(tri_verts, leaf_size)


def _build_bvh_python(tri_verts: np.ndarray, leaf_size: int):
    """Pure-Python median-split BVH (fallback)."""
    t = tri_verts.shape[0]
    centroids = tri_verts.mean(axis=1)
    tri_min = tri_verts.min(axis=1)
    tri_max = tri_verts.max(axis=1)

    order: List[int] = []
    bounds: List[np.ndarray] = []
    meta: List[List[int]] = []

    def build(idxs: np.ndarray) -> int:
        node = len(meta)
        bmin = tri_min[idxs].min(axis=0)
        bmax = tri_max[idxs].max(axis=0)
        bounds.append(np.concatenate([bmin, bmax]).astype(np.float32))
        meta.append([-1, -1, 0, 0])
        if len(idxs) <= leaf_size:
            meta[node][2] = len(order)
            meta[node][3] = len(idxs)
            order.extend(int(i) for i in idxs)
            return node
        axis = int(np.argmax(bmax - bmin))
        med = np.median(centroids[idxs, axis])
        left_mask = centroids[idxs, axis] <= med
        if left_mask.all() or not left_mask.any():
            half = len(idxs) // 2
            sorted_idxs = idxs[np.argsort(centroids[idxs, axis], kind="stable")]
            l_idx, r_idx = sorted_idxs[:half], sorted_idxs[half:]
        else:
            l_idx, r_idx = idxs[left_mask], idxs[~left_mask]
        meta[node][0] = build(l_idx)
        meta[node][1] = build(r_idx)
        return node

    build(np.arange(t))
    return (np.asarray(order, np.int32), np.stack(bounds),
            np.asarray(meta, np.int32))
