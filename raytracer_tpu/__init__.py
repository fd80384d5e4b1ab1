"""raytracer_tpu — a TPU-native progressive Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Ben-Edwards44/Ray-Tracer (CUDA): progressive interactive path tracing with
spheres/triangles/quads/cuboids/meshes, four texture types, three material
models, OBJ loading, BVH acceleration, and multi-chip rendering via
``jax.sharding`` — see SURVEY.md for the complete component map.
"""

from .config import CameraConfig, RenderSettings
from .models.camera import CameraArrays, build_camera, primary_rays
from .models.materials import Material, Texture
from .models.scene import SceneArrays, SceneBuilder
from .models.scenes import build_scene
from .ops import film
from .ops.integrator import render_frame, render_sample_mean, trace
from .runtime.renderer import Renderer

__version__ = "0.1.0"

__all__ = [
    "CameraConfig", "RenderSettings", "CameraArrays", "build_camera",
    "primary_rays", "Material", "Texture", "SceneArrays", "SceneBuilder",
    "build_scene", "film", "render_frame", "render_sample_mean", "trace",
    "Renderer",
]
