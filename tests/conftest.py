"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax (registering the axon TPU
backend) before pytest starts, so setting env vars here is too late for
jax's config snapshot — update the live config instead. XLA_FLAGS is still
read at first backend initialization, which hasn't happened yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
