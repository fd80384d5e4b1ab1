"""Runtime configuration.

TPU-native replacement for the reference's compile-time constant plane
(SCENE_NUM src/main.cu:11, resolution src/camera.cu:4-5, RenderSettings
src/main.cu:299-331, camera pose src/camera.cu:34-41). Everything the
reference bakes into the binary is a frozen, hashable dataclass here: scalar
knobs become static jit arguments, array-valued state (camera basis, scene)
becomes device arrays. Changing a setting triggers a re-jit instead of a
recompile of the whole program — same "upload once, read everywhere"
semantics, strictly more flexible.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

# Reference defaults (src/main.cu:13, src/main.cu:318-330).
SKY_COLOUR = (0.8, 1.0, 1.0)

# Antialias direction-jitter half-range (src/ray.cu:4).
ANTIALIAS_OFFSET_RANGE = 0.001


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Quality knobs (reference: src/main.cu:299-331).

    Quirk flags capture observed reference behaviours (SURVEY.md §5.1) so we
    can render either reference-faithful or fixed images:

    - ``emissive_terminates``: the reference keeps bouncing after hitting an
      emissive surface (src/raytracer.cu:86-90); True terminates the path.
    - ``fix_exit_ior``: the reference forgets the outer medium's IOR when a
      ray exits glass (src/ray.cu:84-98 sets n2 = current, which was already
      overwritten on entry), so exit refraction never bends. True restores
      n2 = 1 (air) on exit.
    - ``gamma``: the reference writes linear floats straight to u8
      (src/main.cu:343-371); set e.g. 2.2 to gamma-correct the output.
    """

    reflect_limit: int = 5
    rays_per_pixel: int = 100
    antialias: bool = True
    sky_colour: Tuple[float, float, float] = SKY_COLOUR

    # Sampler strategy:
    # - "auto" (default): the full Pallas megakernel when the backend is
    #   pallas and the scene supports it, else path regeneration.
    # - "mega": whole spp x bounce loop in one Pallas kernel with tile-local
    #   early exit and on-core PRNG — the fastest path.
    # - "regen": wavefront path regeneration (one while_loop).
    # - "rebin": regen + row-granular ray re-binning between bounces
    #   (ops/rebin.py) — the fast path for large/incoherent scenes where
    #   tile-granular BVH culling would otherwise collapse after the first
    #   diffuse bounce.
    # - "lanesort": regen + PER-RAY re-binning via an MXU counting sort
    #   (ops/rebin.lane_destinations) — re-coheres tiles even when the
    #   divergence is within 128-lane rows (sphere-field scenes), at the
    #   cost of two packed state movements per bounce. Bitwise identical
    #   image to "regen" (RNG streams ride the permutation).
    # - "scan": the direct spp x bounce nested-scan transcription of the
    #   reference (src/raytracer.cu:71,102).
    # All compute the same estimator with different (equally deterministic)
    # RNG stream assignments.
    sampler: str = "auto"

    # Coherent (tile-shared) scatter sampling: every 1024-lane tile draws
    # ONE random bundle per loop iteration instead of one per lane. Each
    # pixel's marginal distribution is unchanged (its successive samples
    # still see fresh draws every iteration); only cross-pixel covariance
    # within a tile changes — post-diffuse directions then cluster by
    # surface normal, so the tile-sweep BVH gates keep tight footprints on
    # divergent scenes (structured / coherent path sampling). Costs
    # structured intra-tile noise at low spp and bitwise shard-invariance
    # (streams are tile-keyed). None = inherit RAYTRACER_COHERENT env.
    coherent: Optional[bool] = None

    # Fidelity/deviation flags.
    emissive_terminates: bool = False
    fix_exit_ior: bool = False
    gamma: Optional[float] = None

    # Megakernel pixel packing: K pixels per lane, so path regeneration
    # rolls a finished path onto the lane's next PIXEL and the per-tile
    # retirement tail (a tile runs until its slowest lane drains its
    # budget) is paid once per K pixels instead of once per pixel.
    # None = auto at the Renderer layer: K=8 when rays_per_pixel <= 32
    # (measured on one v5e: headline 20 spp 642 -> 741-757 Mrays/s, 4K
    # temporal 1 spp 11.4 -> 12.5 fps; K=8 vs the earlier K=4 default
    # +4.4% headline, docs/TESTLOG.md sessions 7+9), K=1 above, where
    # regeneration already fills the tail and the win was never measured. Explicit int forces K everywhere. The estimator per
    # pixel is unchanged; the pixel->(tile, lane) assignment is not, so
    # K != 1 renders differ bitwise from K=1 under the same statistical
    # contracts as any sampler change. Ignored by the wavefront samplers.
    pixpack: Optional[int] = None

    # Russian roulette (deviation — the reference always traces to
    # reflect_limit, src/raytracer.cu:71). 0 = off (reference-faithful).
    # N >= 1: after a path has completed N bounces it survives each further
    # bounce with probability p = clamp(max(throughput), 0.05, 1) and its
    # throughput is divided by p — an unbiased estimator that stops paying
    # for segments whose contribution is already near zero. Supported by
    # every sampler: the wavefront ones draw an independent 4th uniform
    # per bounce; the megakernel tests survival in-kernel with an extra
    # PRNG draw row (a killed lane regenerates onto its pixel's next
    # sample immediately). When off, RNG streams are bitwise unchanged.
    russian_roulette: int = 0

    def with_sky(self, use_sky: bool) -> "RenderSettings":
        """Cornell-box scenes zero the sky (src/main.cu:325-329)."""
        sky = self.sky_colour if use_sky else (0.0, 0.0, 0.0)
        return dataclasses.replace(self, sky_colour=sky)


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera pose and film size (reference: src/camera.cu:4-5,34-41)."""

    width: int = 1000
    height: int = 800

    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    fov_deg: float = 60.0
    focal_len: float = 0.1

    x_rot: float = 0.0  # radians
    y_rot: float = 0.0
    z_rot: float = 0.0

    @property
    def aspect(self) -> float:
        return self.width / self.height

    @property
    def fov_rad(self) -> float:
        return self.fov_deg * math.pi / 180.0

    @property
    def num_pixels(self) -> int:
        return self.width * self.height
