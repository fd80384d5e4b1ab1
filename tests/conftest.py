"""Test configuration: CPU backend with 8 virtual devices by default.

Sharding tests run on a simulated 8-device mesh per SURVEY.md §4(d); the
config must be set before the JAX backend initialises. Set
``RAYTRACER_TEST_TPU=1`` to run the suite against real hardware instead
(enables the TPU-only megakernel tests).
"""

import os

import jax

if os.environ.get("RAYTRACER_TEST_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_enable_x64", False)
