"""Structural bound analysis for divergent-scene traversal.

Covers both divergent BASELINE workloads: the 10k random-sphere stress
scene (default; sphere pool) and --scene monkey (the Suzanne + area-light
1080p config; triangle pool).

The committed, reproducible form of the round-3 CPU counter experiment
(docs/ROADMAP.md item 3): measures the *structural* quantities that bound
any tile-synchronous sweep on the 10k random-sphere stress scene, so the
"why is stress10k slow" story rests on a checked-in artifact instead of a
session log. Runs on the CPU backend (pure XLA oracle + numpy slab tests;
no Pallas, no hardware needed).

What it measures, per (32, 128)-ray megakernel tile:

  - per-ray entered clusters (slab vs the ray's own nearest-t): the
    footprint a *perfect per-ray traversal* (the reference's per-thread
    stack DFS, src/objects.cu:487-532) would sweep;
  - max-over-tile entered clusters: the trip count of the per-lane
    traversal (ops/sweep.py lane_traverse) on that tile;
  - tile-union entered clusters: what every shared tile sweep (gates,
    mask-pop, any visitation order) must sweep — the union footprint;
  - scalar-sync counts per tile for each built scheme: per-cluster gates,
    GATE2 pairs, mask-pop (retest / retest-free pops).

Ray populations: primary rays (Morton-tiled, the coherent regime) and
post-diffuse secondaries in three tilings — regen compaction order (the
production wavefront), lanesort re-binned ((cell x octant) counting sort,
ops/rebin.lane_buckets), and an idealised *per-ray* sort by the same key
(the upper bound any re-binning can reach). The gap between "union" and
"per-ray" footprints is the structural price of tile-synchronous sweeping;
the gap between regen and sorted unions is all lanesort can ever recover.

The bounce directions use an independent numpy RNG (statistical experiment,
not a bitwise replay of the production sampler).

Usage: python benchmarks/divergence_bound.py [--tiles 32] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TILE_ROWS, LANES = 32, 128
TILE = TILE_ROWS * LANES


def entered(o, d, t_best, boxes):
    """Slab entry per (ray, cluster), pruned by each ray's nearest-t.

    Mirrors sweep.slab_tmin with best-t pruning (``tmin < t_best``): the
    footprint after ideal near-first gate closing. ``o``/``d`` (N, 3),
    ``t_best`` (N,), ``boxes`` (C, 8) -> (N, C) bool."""
    with np.errstate(divide="ignore"):
        inv = np.where(d == 0.0, 1e30, 1.0 / d)
    t1 = (boxes[None, :, 0:3] - o[:, None, :]) * inv[:, None, :]
    t2 = (boxes[None, :, 3:6] - o[:, None, :]) * inv[:, None, :]
    tmin = np.maximum(np.minimum(t1, t2).max(axis=2), 0.0)
    tmax = np.maximum(t1, t2).min(axis=2)
    return (tmin <= tmax) & (tmax > 0.0) & (tmin < t_best[:, None])


def tile_stats(o, d, t_best, boxes, chunk=TILE):
    """Per-tile (per_ray_mean, per_ray_max, union) over consecutive tiles."""
    per_ray, per_max, unions = [], [], []
    n = (o.shape[0] // chunk) * chunk
    for s in range(0, n, chunk):
        e = entered(o[s:s + chunk], d[s:s + chunk], t_best[s:s + chunk],
                    boxes)
        cnt = e.sum(axis=1)
        per_ray.append(cnt.mean())
        per_max.append(cnt.max())
        unions.append(e.any(axis=0).sum())
    return (float(np.mean(per_ray)), float(np.mean(per_max)),
            float(np.mean(unions)))


def sublane_stats(o, d, t_best, boxes, group_rows=8):
    """Per-group unions inside each (32, 128) tile — the footprint bound of
    a *sublane-group-gated* sweep (VERDICT round-3 item 2): the tile still
    advances in lockstep, but each ``group_rows``-row sublane group sweeps
    only the clusters ITS rays enter, at 1/(32/group_rows) of a full-tile
    sweep's issue cost per cluster.

    Returns (mean sum-of-group-unions per tile, mean tile union,
    issue_ratio) where issue_ratio = (sum_g union_g * group_rows) /
    (union_tile * 32) — the sublane sweep's issue cost relative to today's
    full-tile sweep. 1/issue_ratio is the sweep-side ceiling of the whole
    approach; the scheme also multiplies gate syncs by 32/group_rows."""
    g = group_rows * LANES
    per_tile_sum, unions = [], []
    n = (o.shape[0] // TILE) * TILE
    for s in range(0, n, TILE):
        e = entered(o[s:s + TILE], d[s:s + TILE], t_best[s:s + TILE], boxes)
        unions.append(e.any(axis=0).sum())
        per_tile_sum.append(sum(
            e[gs:gs + g].any(axis=0).sum() for gs in range(0, TILE, g)))
    gsum = float(np.mean(per_tile_sum))
    utile = float(np.mean(unions))
    ratio = (gsum * group_rows) / (utile * TILE_ROWS)
    return gsum, utile, ratio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=32,
                    help="megakernel tiles sampled across the frame")
    ap.add_argument("--num", type=int, default=10000,
                    help="stress-scene sphere count")
    ap.add_argument("--scene", choices=["stress", "monkey"],
                    default="stress",
                    help="stress = 10k-sphere field (sphere pool); monkey "
                         "= the BASELINE mesh config (triangle pool — the "
                         "other divergent-scene workload)")
    ap.add_argument("--json", action="store_true",
                    help="one JSON line instead of the table")
    args = ap.parse_args()

    import jax.numpy as jnp
    from raytracer_tpu.config import CameraConfig
    from raytracer_tpu.models import bench_scenes
    from raytracer_tpu.models.camera import (build_camera, morton_order,
                                             primary_rays)
    from raytracer_tpu.ops import rebin
    from raytracer_tpu.ops.intersect import nearest_hit, resolve_hit

    if args.scene == "monkey":
        # the suite's monkey_1920x1080 config: Suzanne (723 faces) + area
        # light + floor quads — the hot pool is the TRIANGLE clusters
        scene, _ = bench_scenes.monkey_light_scene()
        boxes = np.asarray(scene.tri_clusters)
        leaf = int(scene.tri_leaf)
        n_sup = int(scene.tri_supers.shape[0])
        cfg = CameraConfig(width=1920, height=1080)
        scene_name = "monkey_1080p"
    else:
        scene, _ = bench_scenes.stress_10k_scene(num=args.num)
        boxes = np.asarray(scene.sph_clusters)
        leaf = int(scene.sph_leaf)
        n_sup = int(scene.sph_supers.shape[0])
        cfg = CameraConfig(width=1000, height=800, position=(0, 1, -4))
        scene_name = f"stress{args.num // 1000}k"
    n_cl = boxes.shape[0]
    cam = build_camera(cfg)
    order = morton_order(cfg.width, cfg.height)
    o, d = primary_rays(cam, cfg.width, cfg.height, pixel_order=order)
    o, d = np.asarray(o), np.asarray(d)

    # sample --tiles runs of TILE consecutive Morton pixels, spread evenly
    n_pix = o.shape[0]
    starts = np.linspace(0, n_pix - TILE, args.tiles).astype(int)
    starts -= starts % TILE
    sel = np.concatenate([np.arange(s, s + TILE) for s in starts])
    o, d = o[sel], d[sel]

    rec = nearest_hit(jnp.asarray(o.T), jnp.asarray(d.T), scene)
    shade = resolve_hit(jnp.asarray(o.T), jnp.asarray(d.T), scene, rec)
    t = np.asarray(rec.t)
    hit = np.asarray(rec.hit)
    normal = np.asarray(shade.normal).T            # (N, 3)

    prim = tile_stats(o, d, np.where(hit, t, 1e30), boxes)

    # post-diffuse secondaries: regen-style compaction of the survivors
    rng = np.random.default_rng(0)
    point = o + d * t[:, None]
    g = rng.normal(size=point.shape)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    nd = normal + g
    nd /= np.maximum(np.linalg.norm(nd, axis=1, keepdims=True), 1e-12)
    so, sd = point[hit], nd[hit]
    # full tiles only, and a 128-multiple for lane_destinations: every
    # tiling below then analyses the identical ray set
    keep = (so.shape[0] // TILE) * TILE
    so, sd = so[:keep], sd[:keep]
    srec = nearest_hit(jnp.asarray(so.T), jnp.asarray(sd.T), scene)
    st = np.where(np.asarray(srec.hit), np.asarray(srec.t), 1e30)

    sec = tile_stats(so, sd, st, boxes)

    # lanesort tiling: production counting sort by (cell x octant)
    key = np.asarray(rebin.lane_buckets(
        jnp.asarray(so.T), jnp.asarray(sd.T),
        jnp.zeros(so.shape[0], bool)))
    dest = np.asarray(rebin.lane_destinations(jnp.asarray(key)))
    inv_p = np.empty_like(dest)
    inv_p[dest] = np.arange(dest.shape[0])
    sortd = tile_stats(so[inv_p], sd[inv_p], st[inv_p], boxes)

    # finer lattice than production (grid 4 x octant = 512 buckets): does
    # more key resolution shrink the union, or is the union set by the
    # scene's solid angles regardless?
    g4 = 4
    lo = so.min(axis=0, keepdims=True)
    ext = np.maximum(so.max(axis=0, keepdims=True) - lo, 1e-6)
    cell4 = np.clip((so - lo) / ext * g4, 0, g4 - 1).astype(np.int64)
    oct_ = ((sd[:, 0] < 0) * 4 + (sd[:, 1] < 0) * 2
            + (sd[:, 2] < 0)).astype(np.int64)
    key4 = ((cell4[:, 0] * g4 + cell4[:, 1]) * g4 + cell4[:, 2]) * 8 + oct_
    fine = np.argsort(key4, kind="stable")
    ideal = tile_stats(so[fine], sd[fine], st[fine], boxes)

    # hit-cluster oracle: tile rays by the cluster their OWN nearest hit
    # lands in (unknowable before traversal — the upper bound for ANY
    # state-keyed re-binning; near-first pruning then closes everything
    # behind the hit). Missed rays sort last.
    sidx = np.asarray(srec.idx)
    pool_hit = np.asarray(srec.hit)
    if args.scene == "monkey":
        pool_hit = pool_hit & np.asarray(srec.is_tri)
    hit_cl = np.where(pool_hit, sidx // leaf, n_cl + 1)
    osort = np.argsort(hit_cl, kind="stable")
    oracle = tile_stats(so[osort], sd[osort], st[osort], boxes)

    def syncs(union):
        """Scalar syncs per tile per sweep under each built scheme (each
        sync = one cross-lane reduce feeding a scalar cond, or a min-
        reduce pop). Gate schemes test every cluster (supers close whole
        ranges only when NO lane enters — rare on these tiles, so this is
        the observed upper bound); mask-pop pays only for the union."""
        return {
            "gates": n_cl + n_sup,
            "gate2": n_cl // 2 + n_sup,
            "maskpop_retest": round(2 * union + 2),
            "maskpop_nort": round(union + 2),
        }

    rows = [
        ("primary_morton", prim),
        ("secondary_regen", sec),
        ("secondary_lanesort", sortd),
        ("secondary_grid4_sort", ideal),
        ("secondary_hitcl_oracle", oracle),
    ]
    out = {
        "scene": scene_name,
        "clusters": n_cl, "supers": n_sup,
        "leaf": leaf, "tiles": args.tiles,
    }
    for name, (pr, pm, un) in rows:
        out[name] = {
            "per_ray_entered": round(pr, 1),
            "tile_max_entered": round(pm, 1),
            "tile_union": round(un, 1),
            "union_prims": round(un * leaf),
            "syncs": syncs(un),
        }
    # tile-size sensitivity (regen order): the union SATURATES well below
    # proportionality (8-tile run: 112 -> 145 -> 172 clusters for rows
    # 8/16/32), so per-ray sweep cost (union_prims / rays) FALLS as tiles
    # grow — and syncs/ray falls with it. Bigger tiles amortize a
    # saturating union; the open hardware question is SROWS=64 (VMEM/
    # register pressure vs the ~1.7x structural amortization), queued in
    # scripts/hw_queue.sh.
    tsize = {}
    for rows_ in (8, 16, 32):
        chunk = rows_ * LANES
        _, _, un = tile_stats(so, sd, st, boxes, chunk=chunk)
        tsize[f"rows{rows_}"] = {
            "tile_union": round(un, 1),
            "prims_per_ray": round(un * leaf / chunk, 2),
            "maskpop_nort_syncs_per_ray": round((un + 2) / chunk, 3),
        }
    out["secondary_regen_tile_size"] = tsize

    # Sublane-group gate granularity (round-4 candidate): per-8/16-row
    # group unions within the SAME 32-row tiles (same ray binning as
    # production). The issue ratio bounds the sweep-side win; syncs
    # multiply by the group count. Computed for the two hot populations.
    sub = {}
    for gname, (po, pd, pt) in (("secondary_regen", (so, sd, st)),
                                ("secondary_lanesort",
                                 (so[inv_p], sd[inv_p], st[inv_p]))):
        for gr in (8, 16):
            gsum, utile, ratio = sublane_stats(po, pd, pt, boxes,
                                               group_rows=gr)
            sub[f"{gname}_rows{gr}"] = {
                "sum_group_unions": round(gsum, 1),
                "tile_union": round(utile, 1),
                "issue_ratio": round(ratio, 3),
                "sweep_ceiling": round(1.0 / ratio, 2),
                "gate_sync_multiplier": TILE_ROWS // gr,
            }
    out["sublane_groups"] = sub

    # Chunked-lane cost model (round 5, sweep.lane_traverse with
    # LANE_CHUNK_CL chunks): predicted vector-op counts per tile-iteration
    # for the per-lane traversal vs the shared union sweep, on the same
    # measured footprints. Per visited primitive the lane path pays
    # params x chunks lane-gathers (+ chunks-1 selects per param) + the
    # body test; mask building slab-tests every lane cluster twice
    # (near-first bootstrap + best-t rebuild); each pop costs ~6 ops per
    # 31-bit mask word. The shared sweep pays the tile-union footprint at
    # broadcast cost. Ratios > 1 predict a lane-path win on the sweep
    # portion (scalar gate syncs, which the lane path avoids, are NOT in
    # the model — treat it as the conservative side).
    #
    # HARDWARE OUTCOME (docs/TESTLOG.md session 11): the prediction's
    # DIRECTION was wrong — chunks3 predicted a 1.53x sweep-side win on
    # stress10k secondaries, but the built path measured -24% (hybrid
    # 10.55/10.56 vs default 13.88) and monkey's 1-chunk config -46%.
    # Vector-op counting cannot see what actually dominates: the per-chunk
    # lane-gather dependency chains (each take_along_axis serialises
    # against the chunk-select), the 17.2 MiB multi-chunk mask carry's
    # VMEM pressure, and the double slab pass. Keep this model as the
    # op-count *floor* it is; do not use it to green-light lane-path
    # builds without a hardware A/B.
    n_params = 4 if args.scene == "stress" else 13   # cx/cy/cz/cr2 vs Woop
    body_ops = 12 if args.scene == "stress" else 24
    # per-primitive bounds in BVH pool order, to re-cut exact lane leaves
    if args.scene == "monkey":
        t_n = int(np.sum(np.asarray(scene.tri_v0)[:, 0] < 1e29))
        v0 = np.asarray(scene.tri_v0)[:t_n]
        v1 = v0 + np.asarray(scene.tri_e1)[:t_n]
        v2 = v0 + np.asarray(scene.tri_e2)[:t_n]
        pmin = np.minimum(np.minimum(v0, v1), v2)
        pmax = np.maximum(np.maximum(v0, v1), v2)
    else:
        r_ = np.asarray(scene.sph_radius)
        s_n = int(np.sum(r_ > 0))
        c_ = np.asarray(scene.sph_center)[:s_n]
        pmin = c_ - r_[:s_n, None]
        pmax = c_ + r_[:s_n, None]

    def cut_boxes(lf):
        ncl = -(-pmin.shape[0] // lf)
        bx = np.full((ncl, 8), 0.0, np.float32)
        for i in range(ncl):
            sl = slice(i * lf, min((i + 1) * lf, pmin.shape[0]))
            bx[i, 0:3] = pmin[sl].min(axis=0)
            bx[i, 3:6] = pmax[sl].max(axis=0)
        return bx

    lane_model = {}
    for chunks_max in (1, 2, 3, 4):
        lane_leaf = max(leaf, int(np.ceil(
            np.ceil(pmin.shape[0] / (124.0 * chunks_max)) / 4) * 4))
        lbx = cut_boxes(lane_leaf)
        lane_cl = lbx.shape[0]
        ch = int(np.ceil(lane_cl / 124.0))
        # EXACT per-lane footprint at this leaf (not a scaled estimate —
        # coarser leaves lose more to pool-order locality than a pure
        # prims/leaf scaling predicts; round-3's 84-prim lane leaf
        # measured ~flat vs shared for exactly that reason)
        _, tmax, _ = tile_stats(so, sd, st, lbx)
        gather = n_params * (ch + max(ch - 1, 0))
        visit_ops = tmax * lane_leaf * (gather + body_ops)
        mask_ops = lane_cl * 15 * 2
        pop_ops = tmax * 6 * int(np.ceil(lane_cl / 31.0))
        lane_ops = visit_ops + mask_ops + pop_ops
        shared_ops = sec[2] * leaf * body_ops
        lane_model[f"chunks{chunks_max}"] = {
            "lane_leaf": lane_leaf, "lane_clusters": lane_cl,
            "chunks": ch, "tile_max_entered": round(float(tmax), 1),
            "ops_per_tile_iter": round(lane_ops),
            "shared_ops_per_tile_iter": round(shared_ops),
            "predicted_sweep_ratio": round(shared_ops / lane_ops, 2),
        }
    out["lane_chunk_model_secondary"] = lane_model

    if args.json:
        print(json.dumps(out))
        return
    print(f"# {out['scene']}: {n_cl} clusters x {out['leaf']} leaf, "
          f"{n_sup} supers, {args.tiles} tiles of {TILE} rays")
    hdr = (f"{'population':<22}{'per-ray':>9}{'tile-max':>10}"
           f"{'union':>8}{'u-prims':>9}{'syncs g/g2/mp/mp0':>20}")
    print(hdr)
    for name, _ in rows:
        r = out[name]
        s = r["syncs"]
        print(f"{name:<22}{r['per_ray_entered']:>9}"
              f"{r['tile_max_entered']:>10}{r['tile_union']:>8}"
              f"{r['union_prims']:>9}"
              f"{s['gates']:>8}/{s['gate2']}/{s['maskpop_retest']}"
              f"/{s['maskpop_nort']}")
    print("\n# tile-size sensitivity (secondary, regen order):")
    for k, v in tsize.items():
        print(f"  {k:<8} union {v['tile_union']:>6}  "
              f"prims/ray {v['prims_per_ray']:>6}  "
              f"mp0-syncs/ray {v['maskpop_nort_syncs_per_ray']:>6}")
    print("\n# sublane-group gates (within 32-row tiles; sweep-side "
          "ceiling = full-tile issue / grouped issue):")
    for k, v in sub.items():
        print(f"  {k:<28} sum-grp-unions {v['sum_group_unions']:>7}  "
              f"tile-union {v['tile_union']:>6}  "
              f"ceiling {v['sweep_ceiling']:>5}x  "
              f"syncs x{v['gate_sync_multiplier']}")
    print("\n# chunked-lane cost model (secondary regen tiles; gather = "
          "params x chunks per prim):")
    for k, v in lane_model.items():
        print(f"  {k:<8} leaf {v['lane_leaf']:>3} x {v['lane_clusters']:>3}"
              f" cl ({v['chunks']} ch)  tmax {v['tile_max_entered']:>5}"
              f"  lane-ops {v['ops_per_tile_iter']:>7}"
              f"  shared-ops {v['shared_ops_per_tile_iter']:>7}"
              f"  ratio {v['predicted_sweep_ratio']:>5}x")
    print("\n# reading: a shared tile sweep pays union_prims primitive "
          "tests + the scheme's syncs;\n# a perfect per-ray traversal "
          "pays per_ray_entered x leaf; the per-lane traversal pays\n"
          "# tile_max_entered x leaf (in gather-cost ops). The "
          "union-vs-per-ray gap is structural\n# (tile-synchrony), not a "
          "visitation-order or gate-scheme artifact.")


if __name__ == "__main__":
    main()
