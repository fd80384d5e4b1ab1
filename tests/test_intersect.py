"""Intersection unit tests: sphere quadratic, Möller–Trumbore, Woop
equivalence, one-way culling, nearest-hit merge, shading resolution.

Ops use the SoA (3, N) ray layout; helpers here build rays in that form.
"""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.materials import Material, Texture
from raytracer_tpu.models.scene import SceneBuilder
from raytracer_tpu.ops import intersect as I

WHITE = Material.standard(Texture.const_colour((1, 1, 1)), 0)


def _rays(o_list, d_list):
    """Returns (3, N) origins and unit directions."""
    o = jnp.asarray(o_list, jnp.float32).T
    d = jnp.asarray(d_list, jnp.float32).T
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    return o, d


def _homog(o, d):
    n = o.shape[1]
    o_h = jnp.concatenate([o, jnp.ones((1, n))], axis=0)
    d_h = jnp.concatenate([d, jnp.zeros((1, n))], axis=0)
    return o_h, d_h


def test_sphere_basic_hit_miss():
    b = SceneBuilder()
    b.add_sphere((0, 0, 2), 0.5, WHITE)
    scene = b.build()
    o, d = _rays([[0, 0, 0], [0, 0, 0], [0, 2, 0]],
                 [[0, 0, 1], [0, 1, 0], [0, 0, 1]])
    ts = I.sphere_hit_ts(o, d, scene.sph_center, scene.sph_radius)
    assert float(ts[0, 0]) == np.float32(1.5)
    assert float(ts[1, 0]) >= 1e29  # points away
    assert float(ts[2, 0]) >= 1e29  # parallel offset


def test_sphere_inside_hit():
    """Ray starting inside a sphere: nearer root is negative, so the
    reference's single-root test misses from inside — keep that semantic
    (src/objects.cu:55-58 takes only the '-' root)."""
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, WHITE)
    scene = b.build()
    o, d = _rays([[0, 0, 0]], [[0, 0, 1]])
    ts = I.sphere_hit_ts(o, d, scene.sph_center, scene.sph_radius)
    assert float(ts[0, 0]) >= 1e29


def test_triangle_mt_and_woop_agree():
    rng = np.random.default_rng(42)
    b = SceneBuilder()
    for _ in range(40):
        p = rng.normal(size=(3, 3)).astype(np.float32)
        b.add_triangle(p[0], p[1], p[2], WHITE)
    scene = b.build()

    n = 256
    o = jnp.asarray(rng.normal(size=(n, 3)).T * 2, jnp.float32)
    dn = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray((dn / np.linalg.norm(dn, axis=1, keepdims=True)).T)

    ts_mt = np.asarray(I.triangle_hit_ts_mt(o, d, scene))
    o_h, d_h = _homog(o, d)
    ts_wp = np.asarray(I._woop_tile_ts(
        o_h, d_h, scene.tri_wu, scene.tri_wv, scene.tri_ww,
        scene.tri_cull, scene.tri_valid))

    hit_mt, hit_wp = ts_mt < 1e29, ts_wp < 1e29
    # Allow a tiny count of edge-grazing disagreements.
    assert (hit_mt != hit_wp).mean() < 2e-3
    both = hit_mt & hit_wp
    np.testing.assert_allclose(ts_mt[both], ts_wp[both], rtol=1e-4, atol=1e-4)


def test_triangle_exact_hit():
    b = SceneBuilder()
    b.add_triangle((-1, -1, 2), (1, -1, 2), (0, 1, 2), WHITE)
    scene = b.build()
    o, d = _rays([[0, 0, 0], [0, 0, 0]], [[0, 0, 1], [0, -5, 1]])
    ts = np.asarray(I.triangle_hit_ts_mt(o, d, scene))
    np.testing.assert_allclose(ts[0, 0], 2.0, rtol=1e-6)
    assert ts[1, 0] >= 1e29


def test_one_way_quad_culling():
    """OneWayQuad: hits only when dot(dir, normal) >= 0 (src/objects.cu:273-280)."""
    b = SceneBuilder()
    b.add_one_way_quad((-1, 1, 2), (1, 1, 2), (1, -1, 2), (-1, -1, 2),
                       False, WHITE)
    scene = b.build()
    o, d = _rays([[0, 0, 0], [0, 0, 4]], [[0, 0, 1], [0, 0, -1]])
    rec = I.nearest_hit(o, d, scene, backend="xla")
    hits = np.asarray(rec.hit)
    assert hits.sum() == 1


def test_one_way_quad_invert():
    b = SceneBuilder()
    b.add_one_way_quad((-1, 1, 2), (1, 1, 2), (1, -1, 2), (-1, -1, 2),
                       True, WHITE)
    scene = b.build()
    o, d = _rays([[0, 0, 0], [0, 0, 4]], [[0, 0, 1], [0, 0, -1]])
    rec = I.nearest_hit(o, d, scene, backend="xla")
    b2 = SceneBuilder()
    b2.add_one_way_quad((-1, 1, 2), (1, 1, 2), (1, -1, 2), (-1, -1, 2),
                        False, WHITE)
    rec2 = I.nearest_hit(o, d, b2.build(), backend="xla")
    # inverting the normal flips which ray passes
    assert (np.asarray(rec.hit) == ~np.asarray(rec2.hit)).all()


def test_cuboid_six_faces():
    b = SceneBuilder()
    b.add_cuboid((-0.5, 0.5, 1.5), 1.0, 1.0, 1.0, WHITE)
    scene = b.build()
    assert scene.num_triangles >= 12
    o, d = _rays([[0, 0, 0]], [[0, 0, 1]])
    rec = I.nearest_hit(o, d, scene, backend="xla")
    np.testing.assert_allclose(float(rec.t[0]), 1.5, rtol=1e-5)


def test_nearest_merges_pools():
    b = SceneBuilder()
    b.add_sphere((0, 0, 3), 0.5, WHITE)
    b.add_triangle((-1, -1, 2), (1, -1, 2), (0, 1, 2), WHITE)
    scene = b.build()
    o, d = _rays([[0, 0, 0]], [[0, 0, 1]])
    for backend in ("xla", "woop"):
        rec = I.nearest_hit(o, d, scene, backend=backend)
        assert bool(rec.is_tri[0])
        np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-5)


def test_ray_chunking_consistent():
    """nearest_hit over > RAY_CHUNK rays must equal unchunked results."""
    b = SceneBuilder()
    b.add_sphere((0, 0, 3), 1.0, WHITE)
    b.add_triangle((-2, -2, 5), (2, -2, 5), (0, 3, 5), WHITE)
    scene = b.build()
    rng = np.random.default_rng(7)
    n = I.RAY_CHUNK + 37
    o = jnp.zeros((3, n))
    dn = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray((dn / np.linalg.norm(dn, axis=1, keepdims=True)).T)
    rec = I.nearest_hit(o, d, scene)
    rec_small = I.nearest_hit(o[:, :100], d[:, :100], scene)
    np.testing.assert_allclose(np.asarray(rec.t[:100]),
                               np.asarray(rec_small.t), rtol=1e-6)
    assert rec.t.shape == (n,)


def test_resolve_hit_sphere_normal_uv():
    b = SceneBuilder()
    b.add_sphere((0, 0, 2), 0.5, WHITE)
    scene = b.build()
    o, d = _rays([[0, 0, 0]], [[0, 0, 1]])
    rec = I.nearest_hit(o, d, scene)
    sd = I.resolve_hit(o, d, scene, rec)
    np.testing.assert_allclose(np.asarray(sd.point[:, 0]), [0, 0, 1.5],
                               atol=1e-6)
    # outward normal, NOT flipped toward ray (src/objects.cu:66)
    np.testing.assert_allclose(np.asarray(sd.normal[:, 0]), [0, 0, -1],
                               atol=1e-6)
    # hit point at equator front: theta=0 => u=0.5; x=center => phi=pi/2;
    # front (z < center z) => v = v_ratio = 0.25 (src/objects.cu:82-97)
    np.testing.assert_allclose([float(sd.u[0]), float(sd.v[0])],
                               [0.5, 0.25], atol=1e-5)


def test_resolve_hit_triangle_normal_flips():
    b = SceneBuilder()
    b.add_triangle((-1, -1, 2), (1, -1, 2), (0, 1, 2), WHITE)
    scene = b.build()
    o, d = _rays([[0, 0, 0], [0, 0, 4]], [[0, 0, 1], [0, 0, -1]])
    rec = I.nearest_hit(o, d, scene)
    sd = I.resolve_hit(o, d, scene, rec)
    # normal faces against each ray (src/objects.cu:158)
    for i in range(2):
        assert float(jnp.sum(sd.normal[:, i] * d[:, i])) < 0


def test_triangle_uv_interpolation():
    """Barycentric UV with the reference's swapped argument order
    (src/objects.cu:160,196-199)."""
    b = SceneBuilder()
    b.add_triangle((-1, -1, 2), (1, -1, 2), (0, 1, 2), WHITE,
                   uvs=((0, 0), (1, 0), (0.5, 1)))
    scene = b.build()
    # hit at v0 => uv = uv0; hit at centroid => mean uv
    o, d = _rays([[-0.99, -0.99, 0], [0, -1 / 3, 0]],
                 [[0, 0, 1], [0, 0, 1]])
    rec = I.nearest_hit(o, d, scene)
    sd = I.resolve_hit(o, d, scene, rec)
    np.testing.assert_allclose([float(sd.u[0]), float(sd.v[0])], [0, 0],
                               atol=0.02)
    np.testing.assert_allclose([float(sd.u[1]), float(sd.v[1])],
                               [0.5, 1 / 3], atol=1e-4)
