"""SMEM budget accounting tests.

The Pallas kernels keep the packed scene in SMEM (~1 MiB on v5e);
``sweep.smem_bytes`` is the budget formula that decides when a scene must
fall back to the HBM-streamed blocked kernel. A formula that drifts from
``pack_scene``'s actual layout re-creates the round-1 failure mode: a
Mosaic compile-time OOM with a raw stack trace instead of a graceful
fallback (suite_err.log: "Ran out of memory in memory space smem").
These tests pin the formula to the real packed sizes.
"""

import numpy as np

import raytracer_tpu as rt
from raytracer_tpu.models.materials import Material, Texture
from raytracer_tpu.models.scene import SceneBuilder
from raytracer_tpu.ops import megakernel
from raytracer_tpu.ops.sweep import (SMEM_BUDGET, fits_smem, pack_scene,
                                     smem_bytes)


def _actual_packed_bytes(scene) -> int:
    """Bytes the SMEM-resident inputs actually occupy: every pack_scene
    output, the lane-cluster boxes (hybrid traversal), the packed material
    table and the 3-word seed."""
    parts = pack_scene(scene)
    words = sum(int(np.prod(p.shape)) for p in parts)
    words += 8 * max(int(scene.sph_lane_clusters.shape[0]), 1)
    words += 8 * max(int(scene.tri_lane_clusters.shape[0]), 1)
    words += int(np.prod(megakernel.pack_materials(scene).shape))
    words += 3  # seed
    return words * 4


def _check(scene):
    actual = _actual_packed_bytes(scene)
    budgeted = smem_bytes(scene)
    assert budgeted >= actual, (
        f"smem_bytes underestimates the packed layout: {budgeted} < {actual}"
    )
    # the formula should track the layout closely, not just bound it
    assert budgeted - actual <= 256, (budgeted, actual)


def test_budget_formula_matches_pack_scene_reference_scenes():
    for i in range(5):
        scene, _ = rt.build_scene(i)
        _check(scene)


def test_budget_formula_matches_pack_scene_big_sphere_pool():
    rng = np.random.default_rng(0)
    b = SceneBuilder()
    n = 3000
    b.add_spheres(rng.uniform(-10, 10, (n, 3)).astype(np.float32),
                  rng.uniform(0.05, 0.2, n).astype(np.float32),
                  Material.default(),
                  colours=rng.uniform(0, 1, (n, 3)).astype(np.float32))
    _check(b.build())


def test_over_budget_scene_falls_back_not_crash():
    """A scene past the SMEM budget must be rejected by the megakernel's
    supports() (falling back to the HBM-streamed wavefront path), never
    handed to the SMEM-resident kernel."""
    rng = np.random.default_rng(1)
    b = SceneBuilder()
    n = 40_000  # ~40k spheres * 24 B > 800 kB budget
    b.add_spheres(rng.uniform(-10, 10, (n, 3)).astype(np.float32),
                  rng.uniform(0.05, 0.2, n).astype(np.float32),
                  Material.default(),
                  colours=rng.uniform(0, 1, (n, 3)).astype(np.float32))
    scene = b.build()
    assert smem_bytes(scene) > SMEM_BUDGET
    assert not fits_smem(scene)
    assert not megakernel.supports(scene)
