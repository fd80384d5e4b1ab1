"""Scene builder, OBJ loader, and the five reference scenes."""

import os
import tempfile

import numpy as np

from raytracer_tpu.models.materials import (MAT_EMISSIVE, MAT_REFRACTIVE,
                                            MAT_STANDARD, Material, Texture)
from raytracer_tpu.models.obj_loader import ObjMesh, parse_obj_python
from raytracer_tpu.models.scene import SceneBuilder
from raytracer_tpu.models.scenes import NUM_SCENES, build_scene

OBJ_TEXT = """
# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
f 1/1/1 2/2/1 3/3/1
f 1 2 3 4
"""


def _write_obj():
    f = tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False)
    f.write(OBJ_TEXT)
    f.close()
    return f.name


def test_obj_parse():
    path = _write_obj()
    verts, faces = parse_obj_python(path)
    assert verts.shape == (4, 3)
    assert len(faces) == 2
    np.testing.assert_array_equal(faces[0], [0, 1, 2])  # 1-indexed fixed
    np.testing.assert_array_equal(faces[1], [0, 1, 2, 3])
    os.unlink(path)


def test_obj_transforms():
    path = _write_obj()
    m = ObjMesh.load(path)
    m.enlarge(2.0).translate(1.0, 0.0, 0.0)
    np.testing.assert_allclose(m.vertices[1], [3.0, 0.0, 0.0], rtol=1e-6)
    # rotate 90deg about z (reference layout: z_rot is textbook CCW)
    m2 = ObjMesh.load(path)
    m2.rotate(0, 0, np.pi / 2)
    np.testing.assert_allclose(m2.vertices[1], [0.0, 1.0, 0.0], atol=1e-6)
    os.unlink(path)


def test_mesh_quad_faces_triangulated():
    path = _write_obj()
    m = ObjMesh.load(path)
    b = SceneBuilder()
    b.add_mesh(m.faces, Material.standard(Texture.const_colour((1, 1, 1)), 0))
    scene = b.build()
    # 1 tri face + 1 quad face -> 3 triangles
    assert int(np.asarray(scene.tri_valid).sum()) == 3
    assert b.mesh_ranges == [(0, 3)]
    os.unlink(path)


def test_material_dedup_by_behaviour():
    """Materials intern by *behaviour*: colour / smoothness / IOR are
    denormalised onto primitives (the reference keeps a full Material per
    object, src/objects.cu:813-820), so a thousand random-coloured diffuse
    spheres share one table row."""
    import numpy as np
    b = SceneBuilder()
    m1 = Material.standard(Texture.const_colour((1, 1, 1)), 0)
    m2 = Material.standard(Texture.const_colour((0.5, 0.2, 0.1)), 0.7)
    m3 = Material.refractive(Texture.const_colour((1, 1, 1)), 1.5)
    b.add_sphere((0, 0, 1), 1, m1)
    b.add_sphere((0, 0, 3), 1, m2)
    b.add_sphere((0, 0, 5), 1, m3)
    scene = b.build()
    assert scene.mat_type.shape[0] == 2  # standard-behaviour + refractive
    # denormalised albedo is quantised to 10 bits/channel at build time
    # (the sweep packs it into one int32 select)
    from raytracer_tpu.ops.sweep import quantise_colour
    np.testing.assert_allclose(np.asarray(scene.sph_colour[1]),
                               quantise_colour((0.5, 0.2, 0.1)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.sph_colour[1]),
                               [0.5, 0.2, 0.1], atol=5e-4)
    from raytracer_tpu.ops.sweep import quantise_smooth
    assert float(scene.sph_smooth[1]) == float(quantise_smooth(0.7))
    # the refractive index rides the deduplicated material behaviour table
    assert float(scene.mat_ior[int(scene.sph_mat[2])]) == 1.5


def test_all_scenes_build():
    for i in range(NUM_SCENES):
        scene, use_sky = build_scene(i)
        assert scene.num_spheres >= 1 or scene.num_triangles >= 1
        if i == 4:
            assert use_sky
            assert int(np.asarray(scene.sph_radius > 0).sum()) == 100
        else:
            assert not use_sky  # all have a cornell box


def test_scene_material_types():
    scene, _ = build_scene(3)  # glass sphere
    types = np.asarray(scene.mat_type)
    assert (types == MAT_REFRACTIVE).any()
    assert (types == MAT_EMISSIVE).any()   # cornell light
    assert (types == MAT_STANDARD).any()


def test_scene_padding_is_inert():
    scene, _ = build_scene(1)
    valid = np.asarray(scene.tri_valid)
    radius = np.asarray(scene.sph_radius)
    assert (radius[4:] <= 0).all()   # 4 real spheres
    # padded triangles are marked invalid
    n_real = 6 * 2 + 6 * 2  # 5 walls + 1 one-way = 6 quads, + cuboid 6 quads
    assert valid[:n_real].all()
    assert not valid[n_real:].any()


def test_bad_scene_number():
    import pytest
    with pytest.raises(ValueError):
        build_scene(99)
