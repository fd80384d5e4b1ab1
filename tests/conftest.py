"""Test configuration: force CPU backend with 8 virtual devices.

Sharding tests run on a simulated 8-device mesh per SURVEY.md §4(d); the
config must be set before the JAX backend initialises.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
