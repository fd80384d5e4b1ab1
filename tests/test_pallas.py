"""Pallas kernel tests (interpreter mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.ops import intersect as I
from raytracer_tpu.ops.integrator import render_sample_mean
from raytracer_tpu.ops.intersect_pallas import (RAY_TILE,
                                                hit_and_resolve_pallas,
                                                nearest_hit_pallas)


def _assert_oracle_match(rec_p, rec_x, rtol=3e-4, atol=3e-4):
    """Pallas vs XLA-oracle hit records must agree. Near-tangent hits sit on
    the catastrophic-cancellation branch of the sphere quadratic
    ``t = h - sqrt(h^2 - c)``; Mosaic and XLA contract those fmas
    differently, so on real hardware a grazing ray's t can drift by ~1e-3
    absolute (and its winner index may flip when two primitives tie within
    that drift). Everything decisive must match exactly."""
    np.testing.assert_array_equal(np.asarray(rec_p.hit), np.asarray(rec_x.hit))
    both = np.asarray(rec_p.hit)
    tp = np.asarray(rec_p.t)[both]
    tx = np.asarray(rec_x.t)[both]
    np.testing.assert_allclose(tp, tx, rtol=rtol, atol=max(atol, 1.5e-3))
    ip = np.asarray(rec_p.idx)[both]
    ix = np.asarray(rec_x.idx)[both]
    decisive = np.abs(tp - tx) <= atol + rtol * np.abs(tx)
    np.testing.assert_array_equal(ip[decisive], ix[decisive])
    # Grazing disagreements must stay rare (measured ~2% on the 1500-sphere
    # cell-ordered scene on real hardware; anything systematic would crater
    # this to ~0).
    assert decisive.mean() > 0.95
    return both


def _rand_rays(n, seed=0, spread=0.2):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.normal(size=(3, n)) * spread, jnp.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=0, keepdims=True))
    return o, d


def test_pallas_matches_xla_nearest_hit():
    scene, _ = rt.build_scene(1)
    o, d = _rand_rays(RAY_TILE + 100)
    rec_p = nearest_hit_pallas(o, d, scene)
    rec_x = I.nearest_hit(o, d, scene, backend="xla")
    np.testing.assert_array_equal(np.asarray(rec_p.hit), np.asarray(rec_x.hit))
    both = np.asarray(rec_p.hit)
    np.testing.assert_allclose(np.asarray(rec_p.t)[both],
                               np.asarray(rec_x.t)[both], rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(rec_p.is_tri)[both],
                                  np.asarray(rec_x.is_tri)[both])
    np.testing.assert_array_equal(np.asarray(rec_p.idx)[both],
                                  np.asarray(rec_x.idx)[both])


def test_pallas_resolve_matches_xla():
    scene, _ = rt.build_scene(2)  # textured sphere => sphere UV exercised
    o, d = _rand_rays(512, seed=3)
    rec_p, sd_p = hit_and_resolve_pallas(o, d, scene, need_sphere_uv=True)
    rec_x = I.nearest_hit(o, d, scene, backend="xla")
    sd_x = I.resolve_hit(o, d, scene, rec_x)
    hit = np.asarray(rec_x.hit)
    np.testing.assert_allclose(np.asarray(sd_p.point)[:, hit],
                               np.asarray(sd_x.point)[:, hit],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sd_p.normal)[:, hit],
                               np.asarray(sd_x.normal)[:, hit],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sd_p.u)[hit], np.asarray(sd_x.u)[hit],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sd_p.v)[hit], np.asarray(sd_x.v)[hit],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(sd_p.mat_id)[hit],
                                  np.asarray(sd_x.mat_id)[hit])


def test_pallas_backend_full_trace_agrees():
    scene, use_sky = rt.build_scene(1)
    # pin the sampler: with "auto" the pallas backend would pick the
    # megakernel on TPU, which uses different (on-core) RNG streams
    settings = rt.RenderSettings(rays_per_pixel=4, reflect_limit=4,
                                 sampler="regen").with_sky(use_sky)
    n = 256
    idx = jnp.arange(n, dtype=jnp.int32)
    o = jnp.zeros((n, 3))
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = 1.0
    d[:, 0] = np.linspace(-0.3, 0.3, n)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    r_p, _ = render_sample_mean(scene, settings, idx, o, d, jax.random.key(5),
                                backend="pallas")
    r_x, _ = render_sample_mean(scene, settings, idx, o, d, jax.random.key(5),
                                backend="xla")
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x),
                               rtol=2e-3, atol=2e-3)


def test_pallas_super_clusters_match_oracle():
    """Scenes big enough to engage the second BVH level (super-clusters)."""
    rng = np.random.default_rng(11)
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    b = SceneBuilder()
    mat = Material.standard(Texture.const_colour((1, 1, 1)), 0)
    for _ in range(600):
        b.add_sphere(rng.uniform(-10, 10, 3), float(rng.uniform(0.1, 0.4)), mat)
    scene = b.build()
    assert scene.sph_supers.shape[0] > 0  # second level active

    o, d = _rand_rays(512, seed=12, spread=12.0)
    rec_p = nearest_hit_pallas(o, d, scene)
    rec_x = I.nearest_hit(o, d, scene, backend="xla")
    both = _assert_oracle_match(rec_p, rec_x)


def test_intersection_stats_with_clusters():
    """debug_stats analog: per-ray primitive-test counters with the
    two-level BVH active (src/objects.cu:534-584)."""
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.ops.intersect_pallas import intersection_stats
    rng = np.random.default_rng(5)
    b = SceneBuilder()
    mat = Material.standard(Texture.const_colour((1, 1, 1)), 0)
    for _ in range(600):
        b.add_sphere(rng.uniform(-10, 10, 3), float(rng.uniform(0.1, 0.4)),
                     mat)
    scene = b.build()
    assert scene.sph_supers.shape[0] > 0
    o, d = _rand_rays(512, seed=9, spread=12.0)
    tests, boxes = intersection_stats(o, d, scene)
    t = np.asarray(tests)
    assert boxes > 0
    assert 0 < t.mean() < scene.num_spheres  # culling strictly beats brute


def test_cell_ordered_traversal_matches_oracle():
    """Near-first per-cell cluster ordering (scene._cell_order) changes only
    the sweep's visit order; results must match the index-order oracle."""
    rng = np.random.default_rng(21)
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    b = SceneBuilder()
    b.add_spheres(
        rng.uniform(-10, 10, (1500, 3)), rng.uniform(0.1, 0.4, 1500),
        Material.standard(Texture.const_colour((1, 1, 1)), 0),
        colours=rng.uniform(0, 1, (1500, 3)))
    scene = b.build()
    assert scene.sph_cell_order.shape[0] > 1  # ordered path active

    o, d = _rand_rays(512, seed=22, spread=12.0)
    rec_p = nearest_hit_pallas(o, d, scene)
    rec_x = I.nearest_hit(o, d, scene, backend="xla")
    both = _assert_oracle_match(rec_p, rec_x)


def test_blocked_kernel_matches_oracle(monkeypatch):
    """The HBM-streamed blocked kernel (beyond-SMEM scenes) must agree with
    the index-order oracle; forced on via the env knob so the test scene
    stays small enough for the interpreter."""
    monkeypatch.setattr(
        __import__("raytracer_tpu.ops.intersect_pallas",
                   fromlist=["x"]), "_FORCE_BLOCKED", True)
    rng = np.random.default_rng(31)
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    b = SceneBuilder()
    b.add_spheres(
        rng.uniform(-10, 10, (700, 3)), rng.uniform(0.1, 0.4, 700),
        Material.standard(Texture.const_colour((1, 1, 1)), 0.3),
        colours=rng.uniform(0, 1, (700, 3)))
    # a few triangles so the triangle block path runs too
    white = Material.standard(Texture.const_colour((0.9, 0.9, 0.9)), 0)
    for k in range(40):
        p = rng.uniform(-10, 10, 3)
        b.add_triangle(p, p + rng.uniform(-1, 1, 3), p + rng.uniform(-1, 1, 3),
                       white)
    scene = b.build()

    o, d = _rand_rays(512, seed=32, spread=12.0)
    rec_p, sd_p = hit_and_resolve_pallas(o, d, scene)
    rec_x = I.nearest_hit(o, d, scene, backend="xla")
    sd_x = I.resolve_hit(o, d, scene, rec_x)
    both = _assert_oracle_match(rec_p, rec_x)
    np.testing.assert_array_equal(np.asarray(sd_p.mat_id)[both],
                                  np.asarray(sd_x.mat_id)[both])
    np.testing.assert_allclose(np.asarray(sd_p.colour)[:, both],
                               np.asarray(sd_x.colour)[:, both], atol=1e-6)


def test_maskpop_matches_gate_sweep(monkeypatch):
    """Mask-pop traversal (sweep.MASKPOP: vectorised per-lane entry masks +
    min-reduce pop of the tile union) must be bitwise identical to the
    cond-gate scheme — masks are built at a bootstrap best-t that is never
    tighter than the final one and pops retest with the cluster_gate rule,
    so only the visitation order differs and strict < selects make that
    order-invariant."""
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.ops import sweep as sweep_mod
    rng = np.random.default_rng(7)
    b = SceneBuilder()
    b.add_spheres(
        rng.uniform(-10, 10, (1500, 3)), rng.uniform(0.1, 0.4, 1500),
        Material.standard(Texture.const_colour((1, 1, 1)), 0.2),
        colours=rng.uniform(0, 1, (1500, 3)))
    white = Material.standard(Texture.const_colour((0.9, 0.9, 0.9)), 0)
    for k in range(520):
        p = rng.uniform(-10, 10, 3)
        b.add_triangle(p, p + rng.uniform(-1, 1, 3),
                       p + rng.uniform(-1, 1, 3), white)
    scene = b.build()
    monkeypatch.setattr(sweep_mod, "MASKPOP_MIN", 16)
    assert scene.sph_clusters.shape[0] >= 16      # sphere pool: mask-pop
    assert scene.tri_clusters.shape[0] >= 16      # triangle pool: mask-pop

    # divergent rays: random origins in the field, random directions
    o = jnp.asarray(rng.uniform(-10, 10, (3, 512)), jnp.float32)
    d = rng.normal(size=(3, 512))
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    rec_gate = nearest_hit_pallas(o, d, scene)
    monkeypatch.setattr(sweep_mod, "MASKPOP", True)
    rec_pop = nearest_hit_pallas(o, d, scene)
    np.testing.assert_array_equal(np.asarray(rec_gate.t),
                                  np.asarray(rec_pop.t))
    np.testing.assert_array_equal(np.asarray(rec_gate.idx),
                                  np.asarray(rec_pop.idx))
    np.testing.assert_array_equal(np.asarray(rec_gate.is_tri),
                                  np.asarray(rec_pop.is_tri))

    # (the retest-free pop variant, MASKPOP_RETEST=0, was deleted after
    # losing both hardware A/Bs by ~33% — docs/TESTLOG.md sessions 4-5)


def test_blocked_maskpop_matches_plain_blocked(monkeypatch):
    """Mask-pop also engages inside the HBM-streamed blocked kernel's
    per-block sweeps (traced cl_base); it must stay bitwise identical to
    the blocked kernel's cond-gate scheme — the combination the hardware
    100k A/B (scripts/hw_queue.sh) measures."""
    import raytracer_tpu.ops.intersect_pallas as ip
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.ops import sweep as sweep_mod
    monkeypatch.setattr(ip, "_FORCE_BLOCKED", True)
    rng = np.random.default_rng(11)
    b = SceneBuilder()
    b.add_spheres(
        rng.uniform(-10, 10, (700, 3)), rng.uniform(0.1, 0.4, 700),
        Material.standard(Texture.const_colour((1, 1, 1)), 0.3),
        colours=rng.uniform(0, 1, (700, 3)))
    white = Material.standard(Texture.const_colour((0.9, 0.9, 0.9)), 0)
    for k in range(40):
        p = rng.uniform(-10, 10, 3)
        b.add_triangle(p, p + rng.uniform(-1, 1, 3),
                       p + rng.uniform(-1, 1, 3), white)
    scene = b.build()

    # divergent rays inside the field (the regime the A/B targets)
    o = jnp.asarray(rng.uniform(-10, 10, (3, 512)), jnp.float32)
    d = rng.normal(size=(3, 512))
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    rec_gate = nearest_hit_pallas(o, d, scene)
    monkeypatch.setattr(sweep_mod, "MASKPOP", True)
    monkeypatch.setattr(sweep_mod, "MASKPOP_MIN", 16)
    rec_pop = nearest_hit_pallas(o, d, scene)
    np.testing.assert_array_equal(np.asarray(rec_gate.t),
                                  np.asarray(rec_pop.t))
    np.testing.assert_array_equal(np.asarray(rec_gate.idx),
                                  np.asarray(rec_pop.idx))
    np.testing.assert_array_equal(np.asarray(rec_gate.is_tri),
                                  np.asarray(rec_pop.is_tri))


def test_blocked_nearfirst_matches_static_order(monkeypatch):
    """Tile-true near-first block pops (_BLOCK_NEARFIRST: per-block slab
    tmin up front, pop ascending, re-gate each pop against the evolving
    best-t) must be bitwise identical to the static per-cell block order —
    only the visitation order differs and the strict < winner select makes
    that order-invariant on non-coincident geometry. Needs nblocks > 1
    (> 4096 spheres) for the pop loop to engage."""
    import raytracer_tpu.ops.intersect_pallas as ip
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.ops import sweep as sweep_mod
    monkeypatch.setattr(ip, "_FORCE_BLOCKED", True)
    rng = np.random.default_rng(13)
    b = SceneBuilder()
    b.add_spheres(
        rng.uniform(-10, 10, (4500, 3)), rng.uniform(0.1, 0.4, 4500),
        Material.standard(Texture.const_colour((1, 1, 1)), 0.3),
        colours=rng.uniform(0, 1, (4500, 3)))
    white = Material.standard(Texture.const_colour((0.9, 0.9, 0.9)), 0)
    for k in range(40):
        p = rng.uniform(-10, 10, 3)
        b.add_triangle(p, p + rng.uniform(-1, 1, 3),
                       p + rng.uniform(-1, 1, 3), white)
    scene = b.build()

    # divergent rays inside the field (the regime the 100k A/B targets)
    o = jnp.asarray(rng.uniform(-10, 10, (3, 256)), jnp.float32)
    d = rng.normal(size=(3, 256))
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    monkeypatch.setattr(ip, "_BLOCK_NEARFIRST", False)   # pin static order
    rec_static = nearest_hit_pallas(o, d, scene)
    # oracle check on a MULTI-block scene with a pool-filler tri block
    # (sph_blocks=2, tri_blocks=1): regression for the inverted-filler-box
    # always-enter bug — guarded gates/DMAs and NaN filler rows must not
    # drop real hits or surface stale-scratch ones
    rec_x = I.nearest_hit(o, d, scene, backend="xla")
    _assert_oracle_match(rec_static, rec_x)
    monkeypatch.setattr(ip, "_BLOCK_NEARFIRST", True)    # default since r4
    rec_nf = nearest_hit_pallas(o, d, scene)
    np.testing.assert_array_equal(np.asarray(rec_static.t),
                                  np.asarray(rec_nf.t))
    np.testing.assert_array_equal(np.asarray(rec_static.idx),
                                  np.asarray(rec_nf.idx))
    np.testing.assert_array_equal(np.asarray(rec_static.is_tri),
                                  np.asarray(rec_nf.is_tri))

    # the hardware A/B's headline combination: near-first block pops with
    # mask-pop cluster traversal inside each entered block
    monkeypatch.setattr(sweep_mod, "MASKPOP", True)
    monkeypatch.setattr(sweep_mod, "MASKPOP_MIN", 16)
    rec_both = nearest_hit_pallas(o, d, scene)
    np.testing.assert_array_equal(np.asarray(rec_static.t),
                                  np.asarray(rec_both.t))
    np.testing.assert_array_equal(np.asarray(rec_static.idx),
                                  np.asarray(rec_both.idx))
    np.testing.assert_array_equal(np.asarray(rec_static.is_tri),
                                  np.asarray(rec_both.is_tri))


def test_blocked_trionly_empty_sphere_pool(monkeypatch):
    """A tri-only beyond-SMEM scene still carries one all-filler sphere
    block (pad_pool yields >= 1 block per pool), whose inverted union box
    must be NaN-ified — not left always-entering the swapped slab test.
    Oracle regression for the empty-pool arm of the filler fix, on both
    block orders."""
    import raytracer_tpu.ops.intersect_pallas as ip
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    monkeypatch.setattr(ip, "_FORCE_BLOCKED", True)
    rng = np.random.default_rng(17)
    b = SceneBuilder()
    white = Material.standard(Texture.const_colour((0.9, 0.9, 0.9)), 0.2)
    for k in range(1300):   # > TRI_BLOCK: 2 tri blocks, 1 filler sph block
        p = rng.uniform(-10, 10, 3)
        b.add_triangle(p, p + rng.uniform(-1, 1, 3),
                       p + rng.uniform(-1, 1, 3), white)
    scene = b.build()

    o = jnp.asarray(rng.uniform(-10, 10, (3, 256)), jnp.float32)
    d = rng.normal(size=(3, 256))
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    monkeypatch.setattr(ip, "_BLOCK_NEARFIRST", False)   # pin static order
    rec_p = nearest_hit_pallas(o, d, scene)
    rec_x = I.nearest_hit(o, d, scene, backend="xla")
    _assert_oracle_match(rec_p, rec_x)

    monkeypatch.setattr(ip, "_BLOCK_NEARFIRST", True)    # default since r4
    rec_nf = nearest_hit_pallas(o, d, scene)
    np.testing.assert_array_equal(np.asarray(rec_p.t), np.asarray(rec_nf.t))
    np.testing.assert_array_equal(np.asarray(rec_p.idx),
                                  np.asarray(rec_nf.idx))


def test_blocked_rows_knob_validated(monkeypatch):
    """RAYTRACER_BLOCKED_ROWS values that do not divide the ray-plane row
    count must raise instead of silently truncating the grid (leaving tail
    rows' outputs as garbage). Regression for a round-3 review finding."""
    import raytracer_tpu.ops.intersect_pallas as ip
    monkeypatch.setattr(ip, "_FORCE_BLOCKED", True)
    monkeypatch.setattr(ip, "BROWS", 24)   # rows is a multiple of 32
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    rng = np.random.default_rng(5)
    b = SceneBuilder()
    b.add_spheres(
        rng.uniform(-10, 10, (64, 3)), rng.uniform(0.1, 0.4, 64),
        Material.standard(Texture.const_colour((1, 1, 1)), 0))
    scene = b.build()
    o, d = _rand_rays(512, seed=6, spread=12.0)
    with pytest.raises(ValueError, match="BLOCKED_ROWS"):
        jax.block_until_ready(nearest_hit_pallas(o, d, scene).t)


def test_lane_traversal_matches_shared_sweep(monkeypatch):
    """Per-lane BVH traversal (divergent-ray path, sweep._lane_traverse)
    must be BITWISE identical to the shared gate sweep on both pools: the
    lane planes hold the exact pack_scene pool values and the body math is
    the same code (sph_body_at/tri_body_at), so any deviation is a
    traversal bug (missed/duplicated cluster), not float noise."""
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.ops import sweep as sweep_mod
    # pin the lane branch of the hybrid dispatch regardless of the test
    # rays' coherence metric
    monkeypatch.setattr(sweep_mod, "LANE_FORCE", True)

    def build(lane: bool):
        if lane:
            monkeypatch.setenv("RAYTRACER_LANE", "1")  # pools are opt-in
            monkeypatch.delenv("RAYTRACER_NO_LANE", raising=False)
        else:
            monkeypatch.delenv("RAYTRACER_LANE", raising=False)
            monkeypatch.setenv("RAYTRACER_NO_LANE", "1")
        rng = np.random.default_rng(7)
        b = SceneBuilder()
        b.add_spheres(
            rng.uniform(-10, 10, (600, 3)), rng.uniform(0.1, 0.6, 600),
            Material.standard(Texture.checkerboard((1, 1, 1), (0, 0, 0), 4),
                              0.3))
        green = Material.standard(Texture.const_colour((0.2, 0.9, 0.1)), 0)
        for _ in range(550):
            p = rng.uniform(-10, 10, 3)
            b.add_triangle(p, p + rng.uniform(-1, 1, 3),
                           p + rng.uniform(-1, 1, 3), green)
        return b.build()

    s_lane = build(True)
    assert s_lane.sph_lane_leaf > 0 and s_lane.tri_lane_leaf > 0
    assert s_lane.sph_lane_clusters.shape[0] <= 124
    s_flat = build(False)
    assert s_flat.sph_lane_leaf == 0 and s_flat.tri_lane_leaf == 0

    o, d = _rand_rays(4096, seed=8, spread=12.0)
    rec1, sh1 = hit_and_resolve_pallas(o, d, s_lane)
    rec2, sh2 = hit_and_resolve_pallas(o, d, s_flat)
    assert np.asarray(rec1.hit).sum() > 300  # the comparison has teeth
    for a, b_ in ((rec1.t, rec2.t), (rec1.idx, rec2.idx),
                  (sh1.u, sh2.u), (sh1.v, sh2.v),
                  (sh1.normal, sh2.normal), (sh1.colour, sh2.colour),
                  (sh1.mat_id, sh2.mat_id), (sh1.smooth, sh2.smooth)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_lane_traversal_chunked_matches_shared_sweep(monkeypatch):
    """Chunked lane pools (> sweep.LANE_CHUNK_CL lane clusters => several
    128-wide fetch planes, one lane-gather per chunk + a chunk-id select
    chain) must stay BITWISE identical to the shared gate sweep. Pins a
    small LEAF_TARGET so moderate pools cut to >= 2 chunks without a
    5k-primitive interpret run (at the default leaf 32 the chunk frontier
    is ~4k primitives per pool)."""
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.ops import sweep as sweep_mod
    monkeypatch.setattr(sweep_mod, "LANE_FORCE", True)
    monkeypatch.setattr(sweep_mod, "LEAF_TARGET", 8)

    def build(lane: bool):
        if lane:
            monkeypatch.setenv("RAYTRACER_LANE", "1")
            monkeypatch.delenv("RAYTRACER_NO_LANE", raising=False)
        else:
            monkeypatch.delenv("RAYTRACER_LANE", raising=False)
            monkeypatch.setenv("RAYTRACER_NO_LANE", "1")
        rng = np.random.default_rng(11)
        b = SceneBuilder()
        b.add_spheres(
            rng.uniform(-10, 10, (1200, 3)), rng.uniform(0.1, 0.6, 1200),
            Material.standard(Texture.checkerboard((1, 1, 1), (0, 0, 0), 4),
                              0.3))
        green = Material.standard(Texture.const_colour((0.2, 0.9, 0.1)), 0)
        for _ in range(1000):
            p = rng.uniform(-10, 10, 3)
            b.add_triangle(p, p + rng.uniform(-1, 1, 3),
                           p + rng.uniform(-1, 1, 3), green)
        return b.build()

    s_lane = build(True)
    assert s_lane.sph_lane_leaf > 0 and s_lane.tri_lane_leaf > 0
    # the point of the test: BOTH pools span >= 2 lane chunks
    assert sweep_mod.lane_chunks(
        int(s_lane.sph_lane_clusters.shape[0])) >= 2
    assert sweep_mod.lane_chunks(
        int(s_lane.tri_lane_clusters.shape[0])) >= 2
    s_flat = build(False)
    assert s_flat.sph_lane_leaf == 0 and s_flat.tri_lane_leaf == 0

    o, d = _rand_rays(1024, seed=12, spread=12.0)
    rec1, sh1 = hit_and_resolve_pallas(o, d, s_lane)
    rec2, sh2 = hit_and_resolve_pallas(o, d, s_flat)
    assert np.asarray(rec1.hit).sum() > 100  # the comparison has teeth
    for a, b_ in ((rec1.t, rec2.t), (rec1.idx, rec2.idx),
                  (sh1.u, sh2.u), (sh1.v, sh2.v),
                  (sh1.normal, sh2.normal), (sh1.colour, sh2.colour),
                  (sh1.mat_id, sh2.mat_id), (sh1.smooth, sh2.smooth)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
