"""Native C++ host runtime: OBJ parser and BVH builder (with Python fallback
equivalence)."""

import os
import tempfile

import numpy as np
import pytest

from raytracer_tpu.models.obj_loader import parse_obj_python
from raytracer_tpu.runtime import loader

OBJ_TEXT = """
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
f 1/1/1 2/2/1 3/3/1
f 1 2 3 4
"""


def _obj_file():
    f = tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False)
    f.write(OBJ_TEXT)
    f.close()
    return f.name


def test_native_builds():
    assert loader.build_native(), "native host runtime failed to compile"
    assert loader._get_lib() is not None


def test_native_obj_matches_python():
    path = _obj_file()
    try:
        v_n, f_n = loader.parse_obj(path)
        v_p, f_p = parse_obj_python(path)
        np.testing.assert_allclose(v_n, v_p)
        assert len(f_n) == len(f_p)
        for a, b in zip(f_n, f_p):
            np.testing.assert_array_equal(a, b)
    finally:
        os.unlink(path)


def _check_bvh(tris, order, bounds, meta, leaf_size):
    t = tris.shape[0]
    # order is a permutation
    assert sorted(order.tolist()) == list(range(t))
    leaves = meta[meta[:, 0] == -1]
    assert leaves[:, 3].sum() == t
    assert (leaves[:, 3] <= leaf_size).all()
    # every leaf's triangles are inside its AABB
    tri_min = tris.min(axis=1)
    tri_max = tris.max(axis=1)
    for row in range(meta.shape[0]):
        left, right, start, count = meta[row]
        if left != -1:
            continue
        sel = order[start:start + count]
        assert (tri_min[sel] >= bounds[row, :3] - 1e-5).all()
        assert (tri_max[sel] <= bounds[row, 3:] + 1e-5).all()
    # children nested in parents
    for row in range(meta.shape[0]):
        left, right, _, _ = meta[row]
        if left == -1:
            continue
        for child in (left, right):
            assert (bounds[child, :3] >= bounds[row, :3] - 1e-5).all()
            assert (bounds[child, 3:] <= bounds[row, 3:] + 1e-5).all()


@pytest.mark.parametrize("builder", ["native", "python"])
def test_bvh_invariants(builder):
    rng = np.random.default_rng(3)
    tris = (rng.normal(size=(300, 1, 3)) +
            rng.normal(size=(300, 3, 3)) * 0.1).astype(np.float32)
    if builder == "native":
        if loader._get_lib() is None:
            pytest.skip("native lib unavailable")
        order, bounds, meta = loader.build_bvh_clusters(tris, leaf_size=16)
    else:
        order, bounds, meta = loader._build_bvh_python(tris, leaf_size=16)
    _check_bvh(tris, order, bounds, meta, 16)


def test_bvh_single_leaf():
    tris = np.zeros((4, 3, 3), np.float32)
    tris[:, 1, 0] = 1.0
    tris[:, 2, 1] = 1.0
    order, bounds, meta = loader.build_bvh_clusters(tris, leaf_size=16)
    assert meta.shape[0] == 1
    assert meta[0, 0] == -1 and meta[0, 3] == 4
