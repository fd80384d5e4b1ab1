"""Scene construction: host builders -> structure-of-arrays device pytree.

TPU-native replacement for the reference's ``Object`` tagged union and scene
upload (src/objects.cu:801-916, src/main.cu:290-295). Instead of a 6-way
type-switch per ray (src/objects.cu:827-842), every primitive is lowered at
build time to one of two dense SoA pools:

- spheres: ``(centers, radii, material_ids)``
- triangles: vertices, precomputed edges/normals, per-vertex UVs, a one-way
  cull normal, material ids, and a precomputed world->barycentric ("Woop")
  affine transform that turns ray-triangle intersection into two small
  matmuls (MXU-friendly).

Quads, one-way quads, cuboids and meshes all become triangles, mirroring how
the reference itself composes them (src/objects.cu:203-350, 774-798). The
result is a single pytree of padded, static-shape arrays — the analog of the
``__constant__ const_objects`` upload (src/objects.cu:916) — replicated to
every chip.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .materials import MAT_REFRACTIVE, Material, compile_materials

_PAD = 8  # pad primitive pools to a multiple of this
_CLUSTER_LEAF = 32  # BVH leaf size for tile-sweep culling (measured best)


_SUPER_LEAF = 8     # clusters per super-cluster


def _super_level(clusters: np.ndarray, leaf: int) -> tuple:
    """Group leaf clusters under super-cluster AABBs (second BVH level).

    Returns (reordered_clusters, supers, order). ``order`` (or None) is the
    cluster permutation — the caller must permute the primitive pool in
    leaf-sized blocks to match, because cluster ``start`` columns are
    rewritten to ``index * leaf`` (the sweep derives leaf starts statically).
    """
    c = clusters.shape[0]
    if c <= 2 * _SUPER_LEAF:
        return clusters, np.zeros((0, 8), np.float32), None
    from ..runtime.loader import build_bvh_clusters
    # fake triangles whose bounds equal the cluster boxes
    center = 0.5 * (clusters[:, :3] + clusters[:, 3:6])
    verts = np.stack([clusters[:, :3], clusters[:, 3:6], center], axis=1)
    order, bounds, meta = build_bvh_clusters(verts, _SUPER_LEAF)
    reordered = clusters[order].copy()
    reordered[:, 6] = np.arange(c, dtype=np.float32) * leaf
    supers = _leaf_clusters(bounds, meta)
    return reordered, supers, order


def _leaf_clusters(bounds: np.ndarray, meta: np.ndarray) -> np.ndarray:
    """(num_nodes, 6) bounds + (num_nodes, 4) meta -> (C, 8) leaf rows.

    Bounds are epsilon-padded so flat leaves (e.g. an axis-aligned quad)
    survive the strict slab test.
    """
    leaf = meta[:, 0] == -1
    bmin = bounds[leaf, :3]
    bmax = bounds[leaf, 3:]
    pad = 1e-4 * np.maximum(np.linalg.norm(bmax - bmin, axis=1,
                                           keepdims=True), 1.0) + 1e-6
    return np.column_stack([
        bmin - pad,
        bmax + pad,
        meta[leaf, 2].astype(np.float32),
        meta[leaf, 3].astype(np.float32),
    ]).astype(np.float32)


def _cut_exact_leaves(pmin: np.ndarray, pmax: np.ndarray,
                      leaf: int) -> np.ndarray:
    """Cut the BVH-ordered primitive sequence into chunks of exactly
    ``leaf`` primitives -> (C, 8) cluster rows [min3, max3, start, count].

    The BVH recursion orders primitives spatially; exact-size chunks along
    that order give the Pallas sweep a static leaf trip count (start =
    index * leaf, fully unrollable, zero SMEM loads for ranges). ``count``
    records the real (un-padded) membership for the test counters. Bounds
    are epsilon-padded so flat leaves survive the strict slab test.
    """
    n = pmin.shape[0]
    c = -(-n // leaf)
    big = np.full((c * leaf, 3), np.inf, np.float32)
    big[:n] = pmin
    small = np.full((c * leaf, 3), -np.inf, np.float32)
    small[:n] = pmax
    bmin = big.reshape(c, leaf, 3).min(axis=1)
    bmax = small.reshape(c, leaf, 3).max(axis=1)
    pad = 1e-4 * np.maximum(np.linalg.norm(bmax - bmin, axis=1,
                                           keepdims=True), 1.0) + 1e-6
    starts = (np.arange(c) * leaf).astype(np.float32)
    counts = np.minimum(n - np.arange(c) * leaf, leaf).astype(np.float32)
    return np.column_stack([bmin - pad, bmax + pad,
                            starts, counts]).astype(np.float32)


def _cell_order(clusters: np.ndarray, lo: np.ndarray,
                extent: np.ndarray, grid: int) -> np.ndarray:
    """Near-first cluster visitation order per coarse spatial cell.

    For each cell of a grid x grid x grid lattice over the scene bounds,
    clusters sorted by distance from the cell centre to the cluster AABB.
    The sweep picks the order row matching its ray tile's mean origin, so
    near clusters are swept first and the running best-t closes the gates
    of far clusters — the tile-level analog of the reference's front-to-back
    child ordering + distance pruning (src/objects.cu:508-516). Crucially
    this works even for direction-divergent (post-diffuse-bounce) tiles,
    where direction-based culling is structurally impossible: with 4096
    rays per tile, any visible cluster is entered by *some* lane, but it
    can still lose to every lane's nearer best hit.
    """
    bmin, bmax = clusters[:, :3], clusters[:, 3:6]
    idx = (np.arange(grid, dtype=np.float32) + 0.5) / grid
    centers = lo + np.stack(
        np.meshgrid(idx, idx, idx, indexing="ij"), -1).reshape(-1, 3) * extent
    d = (np.maximum(bmin[None, :, :] - centers[:, None, :], 0.0)
         + np.maximum(centers[:, None, :] - bmax[None, :, :], 0.0))
    dist = np.linalg.norm(d, axis=-1)                     # (grid^3, C)
    return np.argsort(dist, axis=1, kind="stable").astype(
        np.int32).reshape(-1)


def _permute_leaf_blocks(arrs, n_slots: int, order: np.ndarray,
                         leaf: int) -> None:
    """Apply a cluster permutation to the primitive pool in-place, moving
    whole LEAF-sized blocks (keeps start == cluster_index * LEAF true)."""
    for arr in arrs:
        blocks = arr[:n_slots].reshape((len(order), leaf) + arr.shape[1:])
        arr[:n_slots] = blocks[order].reshape((n_slots,) + arr.shape[1:])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneArrays:
    """Device-side scene: padded, static-shape SoA pytree."""

    # Spheres (reference: src/objects.cu:25-98)
    sph_center: jax.Array   # (S, 3) f32
    sph_radius: jax.Array   # (S,) f32; <= 0 marks padding
    sph_mat: jax.Array      # (S,) i32

    # Per-sphere material parameters, denormalised like the reference's
    # per-object Material copies (src/objects.cu:813-820): keeps the shared
    # material table tiny even when every primitive has its own colour /
    # smoothness (e.g. the 10k random-sphere stress scene). Colours are
    # quantised to 10 bits/channel at build time (sweep.quantise_colour) so
    # the Pallas sweep can carry them packed in one int32; the refractive
    # index lives on the (deduplicated) material behaviour table.
    sph_colour: jax.Array   # (S, 3) f32 const-colour (1s when textured)
    sph_smooth: jax.Array   # (S,) f32

    # Triangles (reference: src/objects.cu:101-200)
    tri_v0: jax.Array       # (T, 3) f32
    tri_e1: jax.Array       # (T, 3) f32  points[1] - points[0]
    tri_e2: jax.Array       # (T, 3) f32  points[2] - points[0]
    tri_normal: jax.Array   # (T, 3) f32 unit geometric normal
    tri_uv0: jax.Array      # (T, 2) f32 per-vertex texture coords
    tri_uv1: jax.Array      # (T, 2) f32
    tri_uv2: jax.Array      # (T, 2) f32
    tri_mat: jax.Array      # (T,) i32
    tri_valid: jax.Array    # (T,) bool; False marks padding/degenerate
    # One-way culling (reference OneWayQuad, src/objects.cu:257-290):
    # zero vector = two-sided; otherwise a hit requires dot(dir, cull) >= 0.
    tri_cull: jax.Array     # (T, 3) f32
    # Woop affine rows: [row | -row.p0] so that for homogeneous o=[o,1],
    # d=[d,0]:  t = -(o.ww)/(d.ww), u = o.wu + t*d.wu, v = o.wv + t*d.wv.
    tri_wu: jax.Array       # (T, 4) f32
    tri_wv: jax.Array       # (T, 4) f32
    tri_ww: jax.Array       # (T, 4) f32
    tri_colour: jax.Array   # (T, 3) f32 denormalised const-colour (10-bit)
    tri_smooth: jax.Array   # (T,) f32

    # Material table (reference: src/material.cu:128-186)
    mat_type: jax.Array     # (M,) i32
    mat_smooth: jax.Array   # (M,) f32
    mat_ior: jax.Array      # (M,) f32
    mat_emit: jax.Array     # (M, 3) f32

    # Texture table + atlas (reference: src/material.cu:4-125)
    tex_type: jax.Array     # (M,) i32
    tex_colour: jax.Array   # (M, 3) f32
    tex_light: jax.Array    # (M, 3) f32
    tex_dark: jax.Array     # (M, 3) f32
    tex_nsq: jax.Array      # (M,) f32
    tex_offset: jax.Array   # (M,) i32
    tex_width: jax.Array    # (M,) i32
    tex_height: jax.Array   # (M,) i32
    atlas: jax.Array        # (P, 3) f32 (bf16-representable values)
    # Per-material row offset of the material's image texture inside the
    # megakernel's packed texture planes (0 for non-image materials).
    tex_row: jax.Array      # (M,) i32

    # BVH leaf clusters for tile-sweep culling (reference BVH,
    # src/objects.cu:448-771, redesigned: leaf-only storage, primitives
    # reordered so each leaf is a contiguous range). Rows per cluster:
    # [min_x, min_y, min_z, max_x, max_y, max_z, start, count] (f32; start
    # and count are exact small integers). Shape (C, 8); C == 0 disables
    # culling for that pool.
    tri_clusters: jax.Array
    sph_clusters: jax.Array
    # Second BVH level: each super-cluster row is
    # [min(3), max(3), start, count] over a contiguous range of *clusters*.
    # (C, 8); empty disables the level.
    tri_supers: jax.Array
    sph_supers: jax.Array
    # Per-lane traversal tables (ops/sweep.py lane path — the TPU analog of
    # the reference's per-thread stack DFS, src/objects.cu:487-532): the
    # same BVH-ordered pool cut at a coarser leaf size chosen so the
    # cluster count stays <= 124 — then a cluster index fits one 128-lane
    # dynamic gather and per-lane visitation masks fit four 31-bit words.
    # (C2, 8) rows like the leaf clusters; empty disables the lane path.
    sph_lane_clusters: jax.Array
    tri_lane_clusters: jax.Array
    # Near-first cluster visitation order per coarse spatial cell
    # (_cell_order): (grid^3 * C,) i32, or (1,) when inactive. The sweep
    # picks the row for its tile's mean origin so best-t pruning closes far
    # clusters' gates even for direction-divergent tiles.
    sph_cell_order: jax.Array
    tri_cell_order: jax.Array
    # [lo(3), grid/extent(3)] of the cell lattice; (6,) f32.
    cell_grid: jax.Array

    # Static metadata (not traced): True when any sphere has a UV-dependent
    # texture — lets the integrator skip per-ray lat/long transcendentals
    # (the analog of the reference's need_uv flag, src/material.cu:142).
    needs_sphere_uv: bool = dataclasses.field(
        default=True, metadata=dict(static=True))
    # Static: any image texture present? (The megakernel has no per-lane
    # atlas gather; it is auto-disabled for such scenes.)
    has_image_tex: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # Static: any one-way triangle? Skips the cull dot product per pair.
    has_one_way: bool = dataclasses.field(
        default=True, metadata=dict(static=True))
    # Static: any refractive material? Lets the megakernel skip the whole
    # Snell/Schlick block (2 sqrt + rsqrt + divides per bounce) on scenes
    # without glass (need-based skip, like need_uv src/material.cu:142).
    has_refractive: bool = dataclasses.field(
        default=True, metadata=dict(static=True))
    # Static: any triangle with a UV-dependent texture? Skips barycentric
    # UV interpolation per pair (need_uv analog, src/material.cu:142).
    needs_tri_uv: bool = dataclasses.field(
        default=True, metadata=dict(static=True))
    # Static: per-pool BVH leaf sizes (sweep.leaf_size) — the sweep's inner
    # loops use these as exact, unrollable trip counts.
    sph_leaf: int = dataclasses.field(
        default=32, metadata=dict(static=True))
    tri_leaf: int = dataclasses.field(
        default=32, metadata=dict(static=True))
    # Static: per-lane-traversal leaf sizes (0 = lane path disabled for the
    # pool). sph_lane_clusters.shape[0] * sph_lane_leaf >= pool size.
    sph_lane_leaf: int = dataclasses.field(
        default=0, metadata=dict(static=True))
    tri_lane_leaf: int = dataclasses.field(
        default=0, metadata=dict(static=True))
    # Static layout of image textures inside the megakernel's packed
    # texture planes: ((atlas_offset, height, width, row_offset), ...) for
    # each distinct image, plus the total packed row count (wide images
    # pack into ceil(w/128) column-block rows per image row). Zero rows
    # means no image textures; planes past megakernel.IMG_MAX_ROWS live in
    # HBM and are paged through a VMEM scratch in-kernel, up to the
    # IMG_HBM_MAX_ROWS sanity bound (wavefront fallback beyond that).
    img_layout: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))
    img_rows: int = dataclasses.field(
        default=0, metadata=dict(static=True))

    @property
    def num_spheres(self) -> int:
        return self.sph_center.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]


def _pad_to(arr: np.ndarray, n: int, fill=0.0) -> np.ndarray:
    pad = n - arr.shape[0]
    if pad <= 0:
        return arr
    pad_shape = (pad,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], axis=0)


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


def _prim_params(mat: Material) -> Tuple:
    """(colour3, smoothness) denormalised onto the primitive.

    Quantised at build — colour to 10 bits/channel, smoothness to 8 bits
    (the sweep's packing precision) — so every backend computes from
    identical values."""
    from ..ops.sweep import quantise_colour, quantise_smooth
    colour = mat.texture.colour if mat.texture.type == 0 else (1.0, 1.0, 1.0)
    return (tuple(float(c) for c in quantise_colour(colour)),
            float(quantise_smooth(mat.smoothness)))


@dataclasses.dataclass
class _TriRecord:
    v0: np.ndarray
    v1: np.ndarray
    v2: np.ndarray
    uv: Optional[Tuple] = None            # ((u,v) per vertex) or None
    cull: Optional[np.ndarray] = None     # one-way cull normal or None
    mat_id: int = 0
    params: Tuple = ((1.0, 1.0, 1.0), 0.0)


class SceneBuilder:
    """Collects primitives, then compiles the SoA pytree.

    API mirrors the reference's ``Object::create_*`` factories
    (src/objects.cu:845-906) plus the composed shapes.
    """

    def __init__(self):
        self._spheres: List[Tuple[np.ndarray, float, int]] = []
        self._bulk_spheres: List[Tuple] = []  # vectorised add_spheres chunks
        self._tris: List[_TriRecord] = []
        self._materials: List[Material] = []
        self._mat_index: dict = {}
        self.use_sky: bool = True
        # mesh_id per triangle index, and per-mesh triangle ranges —
        # consumed by the BVH/cluster builder.
        self._tri_mesh_id: List[int] = []
        self.mesh_ranges: List[Tuple[int, int]] = []

    # -- materials ---------------------------------------------------------
    def material_id(self, mat: Material) -> int:
        """Intern the material's *behaviour* (everything except the
        per-primitive colour / smoothness / IOR, which are denormalised onto
        the primitives like the reference's per-object Material copies,
        src/objects.cu:813-820)."""
        key = self._behaviour(mat)
        if key not in self._mat_index:
            self._mat_index[key] = len(self._materials)
            self._materials.append(key)
        return self._mat_index[key]

    @staticmethod
    def _behaviour(mat: Material) -> Material:
        """Everything except the per-primitive colour/smoothness. The
        refractive index stays here: it is a property of the medium shared
        by all primitives of the material, so it rides the (deduplicated)
        table instead of the sweep carry."""
        import dataclasses as _dc
        tex = mat.texture
        if tex.type == 0:  # const colour lives on the primitive
            tex = _dc.replace(tex, colour=(0.0, 0.0, 0.0))
        return _dc.replace(mat, texture=tex, smoothness=0.0)

    # -- primitives --------------------------------------------------------
    def add_sphere(self, center, radius: float, mat: Material) -> None:
        self._spheres.append(
            (np.asarray(center, np.float32), float(radius),
             self.material_id(mat), _prim_params(mat))
        )

    def add_spheres(self, centers, radii, mat: Material,
                    colours=None, smooth=None) -> None:
        """Vectorised bulk add: N spheres sharing one material *behaviour*.

        ``colours`` ((N, 3), optional) and ``smooth`` ((N,) or scalar,
        optional) override the material's denormalised per-primitive albedo
        and smoothness — the bulk analog of constructing N materials that
        differ only in those (they would intern to one behaviour row
        anyway). A per-primitive Python loop costs ~1 s per 10k primitives;
        this path builds 100k spheres in milliseconds.
        """
        from ..ops.sweep import quantise_colour, quantise_smooth
        centers = np.asarray(centers, np.float32).reshape(-1, 3)
        n = centers.shape[0]
        radii = np.broadcast_to(
            np.asarray(radii, np.float32), (n,)).astype(np.float32)
        mid = self.material_id(mat)
        base_col, base_sm = _prim_params(mat)
        if colours is not None and mat.texture.type == 0:
            col = quantise_colour(
                np.asarray(colours, np.float32).reshape(n, 3))
        else:
            col = np.broadcast_to(
                np.asarray(base_col, np.float32), (n, 3))
        sm = np.broadcast_to(np.asarray(
            base_sm if smooth is None else quantise_smooth(smooth),
            np.float32), (n,))
        self._bulk_spheres.append(
            (centers, radii, np.full(n, mid, np.int32),
             np.ascontiguousarray(col, np.float32),
             np.ascontiguousarray(sm, np.float32)))

    def add_triangle(self, p0, p1, p2, mat: Material, uvs=None,
                     cull: Optional[np.ndarray] = None, mesh_id: int = -1) -> None:
        self._tris.append(
            _TriRecord(
                v0=np.asarray(p0, np.float32),
                v1=np.asarray(p1, np.float32),
                v2=np.asarray(p2, np.float32),
                uv=uvs,
                cull=cull,
                mat_id=self.material_id(mat),
                params=_prim_params(mat),
            )
        )
        self._tri_mesh_id.append(mesh_id)

    def add_quad(self, p1, p2, p3, p4, mat: Material,
                 cull: Optional[np.ndarray] = None, mesh_id: int = -1) -> None:
        """Two triangles with the reference's fixed corner UVs
        (src/objects.cu:244-253): t1=(p1,p2,p3), t2=(p1,p4,p3)."""
        uv1, uv2, uv3, uv4 = (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)
        self.add_triangle(p1, p2, p3, mat, uvs=(uv1, uv2, uv3), cull=cull, mesh_id=mesh_id)
        self.add_triangle(p1, p4, p3, mat, uvs=(uv1, uv4, uv3), cull=cull, mesh_id=mesh_id)

    def add_one_way_quad(self, p1, p2, p3, p4, invert_normal: bool, mat: Material) -> None:
        """Quad whose hits require dot(ray_dir, normal) >= 0
        (src/objects.cu:257-290). Both triangles cull against t1's normal."""
        p1a = np.asarray(p1, np.float32)
        e1 = np.asarray(p2, np.float32) - p1a
        e2 = np.asarray(p3, np.float32) - p1a
        n = np.cross(e1, e2)
        n = n / np.linalg.norm(n)
        if invert_normal:
            n = -n
        self.add_quad(p1, p2, p3, p4, mat, cull=n.astype(np.float32))

    def add_cuboid(self, tl_near, width: float, height: float, depth: float,
                   mat: Material) -> None:
        """Six quads from the top-left-near corner (src/objects.cu:327-349)."""
        tl_near = np.asarray(tl_near, np.float32)
        w = np.array([width, 0, 0], np.float32)
        h = np.array([0, height, 0], np.float32)
        d = np.array([0, 0, depth], np.float32)

        tr_near = tl_near + w
        br_near = tr_near - h
        bl_near = tl_near - h
        tl_far = tl_near + d
        tr_far = tl_far + w
        br_far = tr_far - h
        bl_far = tl_far - h

        self.add_quad(tl_near, tr_near, br_near, bl_near, mat)  # front
        self.add_quad(tl_far, tr_far, br_far, bl_far, mat)      # back
        self.add_quad(tl_near, bl_near, bl_far, tl_far, mat)    # left
        self.add_quad(tr_near, br_near, br_far, tr_far, mat)    # right
        self.add_quad(bl_near, br_near, br_far, bl_far, mat)    # bottom
        self.add_quad(tl_near, tr_near, tr_far, tl_far, mat)    # top

    def add_mesh(self, faces: Sequence[np.ndarray], mat: Material) -> int:
        """Add a triangle/quad-faced mesh (the OBJ path, src/main.cu:127-148).

        ``faces`` is a sequence of (3,3) or (4,3) float arrays. Returns the
        mesh id. Shading uses the mesh-level material for every face, which
        is also the reference's behaviour (quirk #7: per-triangle materials
        are ignored at shading time, src/raytracer.cu:41).
        """
        mesh_id = len(self.mesh_ranges)
        start = len(self._tris)
        for face in faces:
            face = np.asarray(face, np.float32)
            if face.shape[0] == 3:
                self.add_triangle(face[0], face[1], face[2], mat, mesh_id=mesh_id)
            elif face.shape[0] == 4:
                self.add_quad(face[0], face[1], face[2], face[3], mat, mesh_id=mesh_id)
            else:
                raise ValueError("Only triangle or quad mesh faces are supported.")
        self.mesh_ranges.append((start, len(self._tris)))
        return mesh_id

    # -- compile -----------------------------------------------------------
    def build(self) -> SceneArrays:
        if not self._materials:
            # Guarantee a non-empty material table.
            self.material_id(Material.default())

        from ..ops.sweep import UNROLL, leaf_size
        bulk_n = sum(c.shape[0] for c, *_ in self._bulk_spheres)
        s = len(self._spheres) + bulk_n
        t = max(len(self._tris), 0)
        # Clustered pools are padded to whole BVH leaves (the sweep derives
        # leaf start = cluster_index * leaf and always sweeps whole leaves;
        # padding primitives are poisoned at pack time). Leaf sizes are
        # per-pool statics chosen to spread primitives evenly (minimal
        # padding waste) while staying a multiple of the sweep unroll.
        import os
        no_clusters = bool(os.environ.get("RAYTRACER_NO_CLUSTERS"))
        s_clustered = s > 2 * _CLUSTER_LEAF and not no_clusters
        t_clustered = t > 2 * _CLUSTER_LEAF and not no_clusters
        s_leaf = leaf_size(s) if s_clustered else _CLUSTER_LEAF
        t_leaf = leaf_size(t) if t_clustered else _CLUSTER_LEAF
        s_pad = _round_up(s, s_leaf if s_clustered else max(_PAD, UNROLL))
        t_pad = _round_up(t, t_leaf if t_clustered else max(_PAD, UNROLL))

        sph_center = np.zeros((s_pad, 3), np.float32)
        sph_radius = np.zeros(s_pad, np.float32)  # pad radius 0 => never hits
        sph_mat = np.zeros(s_pad, np.int32)
        sph_colour = np.ones((s_pad, 3), np.float32)
        sph_smooth = np.zeros(s_pad, np.float32)
        for i, (c, r, m, (col, sm)) in enumerate(self._spheres):
            sph_center[i] = c
            sph_radius[i] = r
            sph_mat[i] = m
            sph_colour[i] = col
            sph_smooth[i] = sm
        i0 = len(self._spheres)
        for (c, r, m, col, sm) in self._bulk_spheres:
            k = c.shape[0]
            sph_center[i0:i0 + k] = c
            sph_radius[i0:i0 + k] = r
            sph_mat[i0:i0 + k] = m
            sph_colour[i0:i0 + k] = col
            sph_smooth[i0:i0 + k] = sm
            i0 += k

        tri_v0 = np.zeros((t_pad, 3), np.float32)
        tri_e1 = np.zeros((t_pad, 3), np.float32)
        tri_e2 = np.zeros((t_pad, 3), np.float32)
        tri_normal = np.zeros((t_pad, 3), np.float32)
        tri_uv = np.zeros((3, t_pad, 2), np.float32)
        tri_mat = np.zeros(t_pad, np.int32)
        tri_colour = np.ones((t_pad, 3), np.float32)
        tri_smooth = np.zeros(t_pad, np.float32)
        tri_valid = np.zeros(t_pad, bool)
        tri_cull = np.zeros((t_pad, 3), np.float32)
        tri_w = np.zeros((3, t_pad, 4), np.float32)

        for i, rec in enumerate(self._tris):
            e1 = rec.v1 - rec.v0
            e2 = rec.v2 - rec.v0
            n = np.cross(e1, e2)
            n_len = np.linalg.norm(n)
            tri_v0[i] = rec.v0
            tri_e1[i] = e1
            tri_e2[i] = e2
            tri_mat[i] = rec.mat_id
            tri_colour[i], tri_smooth[i] = rec.params
            if rec.uv is not None:
                tri_uv[0, i] = rec.uv[0]
                tri_uv[1, i] = rec.uv[1]
                tri_uv[2, i] = rec.uv[2]
            if rec.cull is not None:
                tri_cull[i] = rec.cull
            if n_len <= 0.0 or not np.isfinite(n_len):
                # Degenerate triangle: leave invalid (the reference would
                # propagate NaNs into a guaranteed miss, quirk #6).
                continue
            tri_normal[i] = (n / n_len).astype(np.float32)
            tri_valid[i] = True
            # Woop world->barycentric transform: solve [e1 e2 n] x = p - v0.
            w_mat = np.stack([e1, e2, n / n_len], axis=1).astype(np.float64)
            try:
                inv = np.linalg.inv(w_mat)
            except np.linalg.LinAlgError:
                tri_valid[i] = False
                tri_normal[i] = 0.0
                continue
            for row in range(3):
                tri_w[row, i, :3] = inv[row]
                tri_w[row, i, 3] = -inv[row] @ rec.v0.astype(np.float64)

        # --- BVH leaf clustering for tile-sweep culling -------------------
        # Reorder each primitive pool along the BVH recursion order, then
        # cut it into leaves of exactly _CLUSTER_LEAF primitives; the Pallas
        # kernel slab-tests each leaf AABB per ray tile and skips its
        # primitives when no ray can improve on the current best (redesign
        # of src/objects.cu:448-771 — hierarchy as tile-level culling
        # instead of per-ray pointer-chasing; exact-size leaves make the
        # sweep's inner loop a static, unrollable trip count).
        tri_clusters = np.zeros((0, 8), np.float32)
        sph_clusters = np.zeros((0, 8), np.float32)
        tri_supers = np.zeros((0, 8), np.float32)
        sph_supers = np.zeros((0, 8), np.float32)
        if t_clustered:
            from ..runtime.loader import build_bvh_clusters
            verts = np.stack(
                [tri_v0[:t], tri_v0[:t] + tri_e1[:t], tri_v0[:t] + tri_e2[:t]],
                axis=1)
            order, _, _ = build_bvh_clusters(verts, _CLUSTER_LEAF)
            tri_arrs = [tri_v0, tri_e1, tri_e2, tri_normal, tri_mat,
                        tri_valid, tri_cull, tri_colour, tri_smooth]
            for arr in tri_arrs:
                arr[:t] = arr[:t][order]
            for k in range(3):
                tri_uv[k, :t] = tri_uv[k, :t][order]
                tri_w[k, :t] = tri_w[k, :t][order]
            pmin = np.minimum(np.minimum(verts[order, 0], verts[order, 1]),
                              verts[order, 2])
            pmax = np.maximum(np.maximum(verts[order, 0], verts[order, 1]),
                              verts[order, 2])
            tri_clusters = _cut_exact_leaves(pmin, pmax, t_leaf)
            tri_clusters, tri_supers, corder = _super_level(tri_clusters,
                                                            t_leaf)
            if corder is not None:
                _permute_leaf_blocks(
                    tri_arrs + [tri_uv[0], tri_uv[1], tri_uv[2],
                                tri_w[0], tri_w[1], tri_w[2]],
                    t_pad, corder, t_leaf)
        if s_clustered:
            from ..runtime.loader import build_bvh_clusters
            c = sph_center[:s]
            r = sph_radius[:s, None]
            # spheres as degenerate triangles: bounds = center +- r,
            # centroid = center — reuses the same BVH builder.
            verts = np.stack([c - r, c + r, c], axis=1)
            order, _, _ = build_bvh_clusters(verts, _CLUSTER_LEAF)
            sph_arrs = [sph_center, sph_radius, sph_mat, sph_colour,
                        sph_smooth]
            for arr in sph_arrs:
                arr[:s] = arr[:s][order]
            pmin = (sph_center[:s] - sph_radius[:s, None])
            pmax = (sph_center[:s] + sph_radius[:s, None])
            sph_clusters = _cut_exact_leaves(pmin, pmax, s_leaf)
            sph_clusters, sph_supers, corder = _super_level(sph_clusters,
                                                            s_leaf)
            if corder is not None:
                _permute_leaf_blocks(sph_arrs, s_pad, corder, s_leaf)

        # --- per-lane traversal tables (divergent scenes) -------------------
        # For pools big enough that the tile-sweep's union footprint
        # dominates after diffuse bounces, cut the SAME BVH-ordered pool at
        # a coarser leaf so the cluster count fits one lane-gather (<= 124).
        # The kernels then walk clusters per lane (sweep._lane_traverse)
        # instead of sweeping the tile-union of clusters.
        # Opt-in (RAYTRACER_LANE=1): merely CARRYING the hybrid dispatch
        # (per-pool coherence metric + lax.cond per sweep, lane plane
        # tables resident in VMEM) taxes the shared path even when the
        # lane branch never runs — measured on one v5e: monkey 1080p
        # 125.5 -> 100.5 Mrays/s, stress10k 11.2 -> 10.9. The lane
        # traversal itself also measured slower wherever it engaged
        # (docs/ARCHITECTURE.md round-3 deep dive), so pools default off.
        lane_min = int(os.environ.get("RAYTRACER_LANE_MIN", "512"))
        if (os.environ.get("RAYTRACER_LANE") != "1"
                or os.environ.get("RAYTRACER_NO_LANE")):
            lane_min = 1 << 30
        # Chunked lane pools (VERDICT round-4 item 3): the round-3 lane
        # path capped lane clusters at 124 (4 x 31-bit mask words, one
        # 128-lane gather plane), which forced stress10k's pool to a
        # COARSE 84-prim lane leaf — each pop swept 84 prims and the
        # footprint saving vanished (measured 11.7 hybrid vs 12.5 shared).
        # Chunks of 124 clusters (each with its own 128-wide fetch plane
        # and mask words; sweep.lane_traverse loops them statically) keep
        # the lane leaf at the shared sweep's own granularity: every
        # per-lane fetch stays ONE lane-gather, and the per-lane footprint
        # matches divergence_bound.py's 32-leaf numbers (stress10k:
        # per-lane max 31 clusters vs tile union 172).
        _LANE_CHUNK_CL = 124
        lane_chunks_max = int(os.environ.get("RAYTRACER_LANE_CHUNKS", "4"))
        # Leaf cap: the lane sweep's inner loop is statically unrolled, so
        # pool size is bounded by chunks * 124 * max_leaf; beyond that the
        # HBM-streamed blocked kernel takes over anyway.
        lane_max_leaf = int(os.environ.get("RAYTRACER_LANE_MAX_LEAF", "128"))
        sph_lane_clusters = np.zeros((0, 8), np.float32)
        tri_lane_clusters = np.zeros((0, 8), np.float32)
        sph_lane_leaf = 0
        tri_lane_leaf = 0

        def lane_leaf_for(n):
            # Finest leaf (>= the shared sweep's own leaf_size) whose
            # cluster count fits the chunk budget; 0 = pool too big.
            lf = max(leaf_size(n),
                     _round_up(-(-n // (_LANE_CHUNK_CL * lane_chunks_max)),
                               UNROLL))
            return lf if lf <= lane_max_leaf else 0

        if s_clustered and s >= lane_min and lane_leaf_for(s):
            sph_lane_leaf = lane_leaf_for(s)
            pmin = sph_center[:s] - sph_radius[:s, None]
            pmax = sph_center[:s] + sph_radius[:s, None]
            sph_lane_clusters = _cut_exact_leaves(pmin, pmax, sph_lane_leaf)
        if t_clustered and t >= lane_min and lane_leaf_for(t):
            tri_lane_leaf = lane_leaf_for(t)
            v1 = tri_v0[:t] + tri_e1[:t]
            v2 = tri_v0[:t] + tri_e2[:t]
            pmin = np.minimum(np.minimum(tri_v0[:t], v1), v2)
            pmax = np.maximum(np.maximum(tri_v0[:t], v1), v2)
            tri_lane_clusters = _cut_exact_leaves(pmin, pmax, tri_lane_leaf)

        # --- per-cell near-first visitation orders -------------------------
        # Active for pools with enough clusters that build-order sweeps
        # waste work (>= 24) but small enough that the grid^3 x C id table
        # fits comfortably in SMEM (<= 512 clusters -> <= 128 KB).
        grid_n = 4
        sph_cell_order = np.zeros((1,), np.int32)
        tri_cell_order = np.zeros((1,), np.int32)
        cell_grid = np.zeros((6,), np.float32)
        boxes = [c for c in (sph_clusters, tri_clusters) if c.shape[0] > 0]
        if boxes:
            all_b = np.concatenate(boxes, axis=0)
            lo = all_b[:, :3].min(axis=0)
            extent = np.maximum(all_b[:, 3:6].max(axis=0) - lo, 1e-6)
            cell_grid = np.concatenate(
                [lo, grid_n / extent]).astype(np.float32)

            def order_for(clusters, supers):
                # order the TOP level the sweep will traverse: supers when
                # present (each gate covers a cluster range), else leaves
                top = supers if supers.shape[0] > 0 else clusters
                if 8 <= top.shape[0] <= 512:
                    return _cell_order(top, lo, extent, grid_n)
                return np.zeros((1,), np.int32)

            sph_cell_order = order_for(sph_clusters, sph_supers)
            tri_cell_order = order_for(tri_clusters, tri_supers)

        table = compile_materials(self._materials)

        # --- megakernel image-texture layout -------------------------------
        # Distinct images packed vertically into (rows, 128) channel planes;
        # per-material row offsets let the in-kernel one-hot fetch address
        # them with a single global texture-row coordinate.
        img_layout = []
        img_rows = 0
        tex_row = np.zeros(table.tex_type.shape[0], np.int32)
        seen_off = {}
        for m in range(table.tex_type.shape[0]):
            if table.tex_type[m] != 3:  # TEX_IMAGE
                continue
            off = int(table.tex_offset[m])
            h, w = int(table.tex_height[m]), int(table.tex_width[m])
            if off not in seen_off:
                seen_off[off] = img_rows
                img_layout.append((off, h, w, img_rows))
                # images wider than 128 texels pack each image row into
                # ceil(w/128) column-block rows (megakernel.pack_textures)
                img_rows += h * (-(-w // 128))
            tex_row[m] = seen_off[off]

        needs_sphere_uv = bool(
            np.any(table.tex_type[sph_mat[:s]] != 0)) if s > 0 else False
        needs_tri_uv = bool(
            np.any(table.tex_type[tri_mat[:t]] != 0)) if t > 0 else False
        has_one_way = bool(np.any(tri_cull[:t] != 0)) if t > 0 else False

        return SceneArrays(
            tri_clusters=jnp.asarray(tri_clusters),
            sph_clusters=jnp.asarray(sph_clusters),
            tri_supers=jnp.asarray(tri_supers),
            sph_supers=jnp.asarray(sph_supers),
            sph_lane_clusters=jnp.asarray(sph_lane_clusters),
            tri_lane_clusters=jnp.asarray(tri_lane_clusters),
            sph_lane_leaf=int(sph_lane_leaf),
            tri_lane_leaf=int(tri_lane_leaf),
            sph_cell_order=jnp.asarray(sph_cell_order),
            tri_cell_order=jnp.asarray(tri_cell_order),
            cell_grid=jnp.asarray(cell_grid),
            needs_sphere_uv=needs_sphere_uv,
            has_image_tex=bool(np.any(table.tex_type == 3)),
            has_one_way=has_one_way,
            has_refractive=bool(np.any(np.asarray(table.mat_type)
                                       == MAT_REFRACTIVE)),
            needs_tri_uv=needs_tri_uv,
            sph_leaf=int(s_leaf),
            tri_leaf=int(t_leaf),
            img_layout=tuple(img_layout),
            img_rows=int(img_rows),
            sph_center=jnp.asarray(sph_center),
            sph_radius=jnp.asarray(sph_radius),
            sph_mat=jnp.asarray(sph_mat),
            sph_colour=jnp.asarray(sph_colour),
            sph_smooth=jnp.asarray(sph_smooth),
            tri_v0=jnp.asarray(tri_v0),
            tri_e1=jnp.asarray(tri_e1),
            tri_e2=jnp.asarray(tri_e2),
            tri_normal=jnp.asarray(tri_normal),
            tri_uv0=jnp.asarray(tri_uv[0]),
            tri_uv1=jnp.asarray(tri_uv[1]),
            tri_uv2=jnp.asarray(tri_uv[2]),
            tri_mat=jnp.asarray(tri_mat),
            tri_valid=jnp.asarray(tri_valid),
            tri_cull=jnp.asarray(tri_cull),
            tri_wu=jnp.asarray(tri_w[0]),
            tri_wv=jnp.asarray(tri_w[1]),
            tri_ww=jnp.asarray(tri_w[2]),
            tri_colour=jnp.asarray(tri_colour),
            tri_smooth=jnp.asarray(tri_smooth),
            mat_type=jnp.asarray(table.mat_type),
            mat_smooth=jnp.asarray(table.smoothness),
            mat_ior=jnp.asarray(table.ior),
            mat_emit=jnp.asarray(table.emitted),
            tex_type=jnp.asarray(table.tex_type),
            tex_colour=jnp.asarray(table.tex_colour),
            tex_light=jnp.asarray(table.tex_light),
            tex_dark=jnp.asarray(table.tex_dark),
            tex_nsq=jnp.asarray(table.tex_nsq),
            tex_offset=jnp.asarray(table.tex_offset),
            tex_width=jnp.asarray(table.tex_width),
            tex_height=jnp.asarray(table.tex_height),
            atlas=jnp.asarray(table.atlas),
            tex_row=jnp.asarray(tex_row),
        )
