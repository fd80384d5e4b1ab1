"""Dynamic traversal simulation for the beyond-SMEM blocked kernel (stress100k).

Sibling of benchmarks/divergence_bound.py, one level up the hierarchy — and
a *dynamics* study, not just a structural one. This script replays the
HBM-streamed kernel's gate logic in numpy (per-lane evolving best-t,
per-cell static block order, build-order in-block clusters, global-best
seeding) against the true per-(lane, cluster) nearest-t table, so the cost
can be decomposed into:

  - what the production ORDER sweeps with WORKING gates (see note below);
  - what a tile-true near-first BLOCK order would sweep (pop blocks by
    min-over-lanes tmin — RAYTRACER_BLOCK_NEARFIRST, computable in-kernel
    from 25 slab tests, no host tables), including its early-stop rule
    (the pop loop retires once the min remaining entry distance clears
    every lane's best-t — the tail is never gate-tested);
  - what adding near-first CLUSTER order inside each block gives (pop
    clusters by tile-min tmin — collapses each lane's best-t in its first
    few swept clusters instead of after a build-order scan);
  - the final-t structural floor (gates evaluated against each ray's own
    final nearest-t — unreachable, bounds any single-pass scheme).

NOTE (the bug this sim exposed): the shipped kernel before the round-3
filler fix did NOT behave like the "production" row here. Pool-filler
blocks carried inverted [+INF, -INF] union boxes, and the min/max-swapped
slab test treats an inverted box as its swapped hull — always entered at
tmin = 0. On stress100k (24 of 25 tri sub-blocks pure padding) every tile
therefore entered and swept ALL 25 blocks: the measured ~1.2 Mrays/s was
a filler-gate brute-force scan, not union synchrony. This sim models the
FIXED kernel (real boxes only) and so *predicts* its footprint: ~4 blocks
and ~600 swept prims per coherent primary tile, ~8 blocks / ~4-7k prims
per diffuse-secondary tile (vs ~25 blocks / >100k prims broken). On this
footprint the near-first pops are a small refinement (primaries -5%
prims, secondaries only with in-block cluster_nf), not the main lever.

Hardware attribution (docs/TESTLOG.md session 11, RAYTRACER_BLOCKED_ABLATE
timing arms ×2): the measured frame splits into per-tile bootstrap ~2.3%
(neverenter 72/74 ms vs default 3144/3147 ms), block DMA ~4-6% (dmaonly
250/196 ms — the double-buffered streams already hide most of it), and
entered-block gating + sweeps ~92%; the per-block super level saves ~19%
(nosupers 3861/3865 ms). So the lever this sim should guide next is the
gate/sweep term — deeper in-block hierarchy or tighter per-block unions —
not DMA overlap and not bootstrap amortisation.

Runs on the CPU backend; ~15-25 min at the default --tiles 8 (the oracle
per-(lane, cluster) table over 100k spheres dominates).

Usage: python benchmarks/block_bound.py [--tiles 8] [--num 100000] [--json]
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
SPH_BLOCK = 4096
EPS = 1e-4
BIG = 1e30


def slab_tmin(o, d, boxes):
    """(N, C) slab tmin vs each box; +inf where the ray misses the box."""
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        inv = np.where(d == 0.0, BIG, 1.0 / d)
        t1 = (boxes[None, :, 0:3] - o[:, None, :]) * inv[:, None, :]
        t2 = (boxes[None, :, 3:6] - o[:, None, :]) * inv[:, None, :]
    tmin = np.maximum(np.minimum(t1, t2).max(axis=2), 0.0)
    tmax = np.maximum(t1, t2).min(axis=2)
    enter = (tmin <= tmax) & (tmax > 0.0)
    return np.where(enter, tmin, np.inf)


def cluster_ts(o, d, centers, radii, cpb_prims, leaf):
    """Per-(ray, leaf-cluster) nearest sphere t (np.inf where none): the
    ground-truth table the dynamic replay updates best-t from. Chunked per
    block so the pairwise matrix never exceeds (N, 4096)."""
    n = o.shape[0]
    n_cl = -(-centers.shape[0] // leaf)
    out = np.full((n, n_cl), np.inf, np.float32)
    for s in range(0, centers.shape[0], cpb_prims):
        c = centers[s:s + cpb_prims]
        r = radii[s:s + cpb_prims]
        for rs in range(0, n, TILE):            # bound the (R, P, 3) pairs
            oc = o[rs:rs + TILE, None, :] - c[None, :, :]
            dd = d[rs:rs + TILE]
            b = 2.0 * np.einsum("npk,nk->np", oc, dd)
            cq = np.einsum("npk,npk->np", oc, oc) - (r * r)[None, :]
            disc = b * b - 4.0 * cq
            with np.errstate(invalid="ignore"):
                t = (-b - np.sqrt(np.maximum(disc, 0.0))) * 0.5
            t = np.where((disc >= 0.0) & (t > EPS), t,
                         np.inf).astype(np.float32)
            pads = -(-c.shape[0] // leaf) * leaf - c.shape[0]
            if pads:
                t = np.concatenate(
                    [t, np.full((t.shape[0], pads), np.inf, np.float32)],
                    axis=1)
            mins = t.reshape(t.shape[0], -1, leaf).min(axis=2)
            out[rs:rs + TILE, s // leaf: s // leaf + mins.shape[1]] = mins
    return out


def floor_t(o, d, quad):
    """Per-ray floor-quad hit t (np.inf where none): the scene's 2-triangle
    pool, modelled as a bounded plane."""
    (x0, x1), y, (z0, z1) = quad
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (y - o[:, 1]) / d[:, 1]
    px = o[:, 0] + t * d[:, 0]
    pz = o[:, 2] + t * d[:, 2]
    ok = (t > EPS) & np.isfinite(t) & (px >= x0) & (px <= x1) & \
         (pz >= z0) & (pz <= z1)
    return np.where(ok, t, np.inf).astype(np.float32)


def replay(cl_tmin, cl_t, blk_tmin, blk_tmin_ord, ftri, f_gate, block_order,
           cpb, leaf, sup_group, block_nf, cluster_nf, floor_first,
           final_t=None):
    """Replay the kernel's gate logic on one tile. Returns
    (swept_prims, blocks_entered, gate_syncs).

    cl_tmin/cl_t: (TILE, C) cluster slab tmin / true in-cluster nearest t.
    blk_tmin: (TILE, B) sphere-union slab tmin (the per-lane gate).
    blk_tmin_ord: (TILE, B) COMBINED (sphere ∪ real-tri) union tmin — what
    the kernel's tvec pops by and early-stops on. ftri: (TILE,) floor hit
    t (best-t updates). f_gate: (TILE,) floor-box slab tmin (the gate).
    block_nf / cluster_nf: tile-true near-first order (by min-over-lane
    tmin) instead of the static cell order / build order.
    final_t: evaluate every gate at each lane's final t (structural floor)
    instead of the evolving best-t."""
    bt = np.full(cl_t.shape[0], BIG, np.float32)
    if final_t is not None:
        bt = final_t.copy()
    prims = 0
    entered = 0
    syncs = 0
    ss_rows = cpb // min(sup_group, cpb)

    if floor_first:
        bt = np.minimum(bt, ftri)
        prims += leaf                      # the 32-prim padded tri cluster

    order = block_order
    ord_tmin = None
    if block_nf:
        ord_scalar = blk_tmin_ord.min(axis=0)
        order = np.argsort(ord_scalar, kind="stable")
        ord_tmin = ord_scalar[order]
    for k, b in enumerate(order):
        if block_nf and ord_tmin[k] >= bt.max():
            break                          # kernel's pop-loop early stop:
            # the remaining tail is never gate-tested at all
        syncs += 1                         # block union gate / pop
        gate = blk_tmin[:, b] < bt
        if b == 0 and not floor_first:
            # the kernel's tri gate is the floor quad's AABB slab test
            # (its synthesised cluster box), not the exact quad hit
            gate |= f_gate < bt
        if not gate.any():
            continue
        entered += 1
        if b == 0 and not floor_first:
            prims += leaf
            if final_t is None:
                bt = np.minimum(bt, ftri)
        cols = slice(b * cpb, (b + 1) * cpb)
        ctm = cl_tmin[:, cols]
        ctt = cl_t[:, cols]
        corder = (np.argsort(ctm.min(axis=0), kind="stable")
                  if cluster_nf else range(cpb))
        syncs += ss_rows                   # in-block super gates
        for c in corder:
            syncs += 1
            hit = ctm[:, c] < bt
            if hit.any():
                prims += leaf
                if final_t is None:
                    bt = np.minimum(bt, ctt[:, c])
    return prims, entered, syncs


def make_border(blk_boxes_comb, nblocks, og=4):
    """Replicate _run_kernel_blocked's per-cell near-first block order and
    the lattice params; returns (border (og^3, B), glo, inv)."""
    lo = blk_boxes_comb[:, 0:3]
    hi = blk_boxes_comb[:, 3:6]
    glo = lo.min(axis=0)
    extent = np.maximum(hi.max(axis=0) - glo, 1e-6)
    cidx = (np.arange(og) + 0.5) / og
    mesh = np.stack(np.meshgrid(cidx, cidx, cidx, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    centers = glo + mesh * extent
    dvec = (np.maximum(lo[None] - centers[:, None], 0.0)
            + np.maximum(centers[:, None] - hi[None], 0.0))
    dist = (dvec * dvec).sum(axis=-1)
    return np.argsort(dist, axis=1, kind="stable"), glo, og / extent


def run_population(name, o, d, t_final, cl_boxes, blk_sph, blk_comb,
                   border, glo, ginv, ftri, fq_box, centers, radii, leaf,
                   sup_group, out):
    n = (o.shape[0] // TILE) * TILE
    o, d, t_final, ftri = o[:n], d[:n], t_final[:n], ftri[:n]
    f_gate = slab_tmin(o, d, fq_box)[:, 0]     # the kernel's block-0 tri
    # gate: the floor quad's synthesised-cluster AABB, not the exact hit
    ntiles = n // TILE
    cpb = SPH_BLOCK // leaf
    nblocks = blk_sph.shape[0]
    og = int(round(len(border) ** (1 / 3)))

    cl_t = cluster_ts(o, d, centers, radii, SPH_BLOCK, leaf)
    pad = nblocks * cpb - cl_t.shape[1]
    if pad:
        cl_t = np.concatenate(
            [cl_t, np.full((n, pad), np.inf, np.float32)], axis=1)
    cl_tmin = slab_tmin(o, d, cl_boxes)
    blk_tmin = slab_tmin(o, d, blk_sph)
    blk_tmin_comb = slab_tmin(o, d, blk_comb)   # the kernel's pop keys

    schemes = {
        "production": dict(block_nf=False, cluster_nf=False,
                           floor_first=False),
        "block_nearfirst": dict(block_nf=True, cluster_nf=False,
                                floor_first=False),
        "block+cluster_nf": dict(block_nf=True, cluster_nf=True,
                                 floor_first=False),
        "floor_first+both_nf": dict(block_nf=True, cluster_nf=True,
                                    floor_first=True),
        "final_t_floor": dict(block_nf=True, cluster_nf=True,
                              floor_first=False, final=True),
    }
    rows = {}
    for sname, cfgd in schemes.items():
        tp, tb, ts = 0.0, 0.0, 0.0
        for ti in range(ntiles):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            om = o[sl].mean(axis=0)
            cell = np.clip(((om - glo) * ginv).astype(int), 0, og - 1)
            cid = (cell[0] * og + cell[1]) * og + cell[2]
            p, b, s = replay(
                cl_tmin[sl], cl_t[sl], blk_tmin[sl], blk_tmin_comb[sl],
                ftri[sl], f_gate[sl], border[cid], cpb, leaf, sup_group,
                cfgd["block_nf"], cfgd["cluster_nf"], cfgd["floor_first"],
                final_t=t_final[sl] if cfgd.get("final") else None)
            tp += p
            tb += b
            ts += s
        rows[sname] = {
            "prims_per_tile": round(tp / ntiles, 1),
            "blocks_per_tile": round(tb / ntiles, 2),
            "syncs_per_tile": round(ts / ntiles, 1),
        }
    out[name] = rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--num", type=int, default=100000)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    from raytracer_tpu.config import CameraConfig
    from raytracer_tpu.models import bench_scenes
    from raytracer_tpu.models.camera import (build_camera, morton_order,
                                             primary_rays)
    from raytracer_tpu.ops.intersect import nearest_hit, resolve_hit
    from raytracer_tpu.ops.intersect_pallas import SUP_GROUP

    scene, _ = bench_scenes.stress_10k_scene(num=args.num)
    leaf = int(scene.sph_leaf)
    centers = np.asarray(scene.sph_center)
    radii = np.asarray(scene.sph_radius)
    cl = np.asarray(scene.sph_clusters)
    cpb = SPH_BLOCK // leaf
    nblocks = -(-cl.shape[0] // cpb)
    padr = nblocks * cpb - cl.shape[0]
    filler = np.tile(np.asarray(
        [[BIG, BIG, BIG, -BIG, -BIG, -BIG, 0, 0]], np.float32), (padr, 1))
    cl = np.concatenate([cl, filler], axis=0) if padr else cl
    grp = cl.reshape(nblocks, cpb, 8)
    blk_sph = np.concatenate([grp[:, :, 0:3].min(axis=1),
                              grp[:, :, 3:6].max(axis=1)], axis=1)
    # combined (sphere ∪ tri) boxes for the border lattice: only block 0
    # has a real tri pool (the floor quad)
    fq = ((-20.0, 20.0), -1.3, (-2.0, 40.0))
    fq_box = np.asarray([[fq[0][0], fq[1], fq[2][0],
                          fq[0][1], fq[1], fq[2][1], 0, 0]], np.float32)
    blk_comb = blk_sph.copy()
    blk_comb[0, 0:3] = np.minimum(blk_comb[0, 0:3], [fq[0][0], fq[1], fq[2][0]])
    blk_comb[0, 3:6] = np.maximum(blk_comb[0, 3:6], [fq[0][1], fq[1], fq[2][1]])
    border, glo, ginv = make_border(blk_comb, nblocks)
    # NaN the filler cluster rows AFTER the unions above — same rule as
    # the kernel (nan_inverted): an inverted box always enters the swapped
    # slab test, so leaving them [BIG, -BIG] would sweep phantom prims in
    # any tile entering the last block and pin fillers first in cluster_nf
    cl[cl[:, 0] > cl[:, 3]] = np.nan

    cfg = CameraConfig(width=1000, height=800, position=(0, 1, -4))
    cam = build_camera(cfg)
    order = morton_order(cfg.width, cfg.height)
    o, d = primary_rays(cam, cfg.width, cfg.height, pixel_order=order)
    o, d = np.asarray(o), np.asarray(d)
    dn = d / np.linalg.norm(d, axis=1, keepdims=True)
    n_pix = o.shape[0]
    starts = np.linspace(0, n_pix - TILE, args.tiles).astype(int)
    starts -= starts % TILE
    sel = np.concatenate([np.arange(s, s + TILE) for s in starts])
    o, d, dn = o[sel], d[sel], dn[sel]

    rec = nearest_hit(jnp.asarray(o.T), jnp.asarray(d.T), scene)
    shade = resolve_hit(jnp.asarray(o.T), jnp.asarray(d.T), scene, rec)
    # t in unit-direction parameterisation (the kernel's), from the
    # oracle's direction-scaled t
    dlen = np.linalg.norm(d, axis=1)
    t = np.asarray(rec.t) * dlen
    hit = np.asarray(rec.hit)
    normal = np.asarray(shade.normal).T

    out = {"scene": f"stress{args.num // 1000}k", "blocks": nblocks,
           "clusters_per_block": cpb, "leaf": leaf, "sup_group": SUP_GROUP,
           "tiles": args.tiles,
           "miss_fraction": round(float((~hit).mean()), 4)}
    run_population("primary_morton", o, dn, np.where(hit, t, BIG), cl,
                   blk_sph, blk_comb, border, glo, ginv, floor_t(o, dn, fq),
                   fq_box, centers, radii, leaf, SUP_GROUP, out)

    rng = np.random.default_rng(0)
    point = o + dn * t[:, None]
    g = rng.normal(size=point.shape)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    nd = normal + g
    nd /= np.maximum(np.linalg.norm(nd, axis=1, keepdims=True), 1e-12)
    so, sd = point[hit], nd[hit]
    keep = (so.shape[0] // TILE) * TILE
    so, sd = so[:keep], sd[:keep]
    srec = nearest_hit(jnp.asarray(so.T), jnp.asarray(sd.T), scene)
    st = np.where(np.asarray(srec.hit), np.asarray(srec.t), BIG)
    out["secondary_miss_fraction"] = round(
        float((~np.asarray(srec.hit)).mean()), 4)
    run_population("secondary_regen", so, sd, st, cl, blk_sph, blk_comb,
                   border, glo, ginv, floor_t(so, sd, fq),
                   fq_box, centers, radii, leaf, SUP_GROUP, out)

    if args.json:
        print(json.dumps(out))
        return
    print(f"# {out['scene']}: {nblocks} blocks x {cpb} clusters x {leaf} "
          f"leaf (SUP_GROUP={SUP_GROUP}), {args.tiles} tiles of {TILE} rays"
          f", miss {out['miss_fraction']}")
    print("# stress10k anchor: ~5500 swept prims + ~380 syncs per tile "
          "= ~12 Mrays/s on one v5e")
    for pop in ("primary_morton", "secondary_regen"):
        print(f"\n## {pop}")
        for sname, r in out[pop].items():
            print(f"  {sname:<22} prims/tile {r['prims_per_tile']:>9}  "
                  f"blocks {r['blocks_per_tile']:>6}  "
                  f"syncs {r['syncs_per_tile']:>7}")
    print("\n# reading: 'production' replays the FIXED kernel (real union "
          "boxes; the shipped kernel\n# before the round-3 filler fix "
          "entered all blocks every tile — see module docstring);\n# the "
          "_nf rows replace the static cell block order / build cluster "
          "order with tile-true\n# near-first pops incl. the pop loop's "
          "early stop (25 + 128 extra slab tests per tile,\n# all "
          "vectorisable); final_t_floor gates at each lane's final t — the "
          "single-pass bound.")


if __name__ == "__main__":
    main()
