"""Test config: force an 8-device virtual CPU mesh.

This replaces the reference's "mock carla" trick (SURVEY.md §4): every
component is a pure function testable on CPU, and multi-chip sharding logic is
exercised on virtual devices via --xla_force_host_platform_device_count.

NOTE: a sitecustomize in this image imports jax at interpreter startup, so
JAX_PLATFORMS from os.environ is already frozen by the time conftest runs —
jax.config.update is the only reliable override. XLA_FLAGS is still read at
backend initialization, which happens later (first jnp op), so the env append
works as long as no test touches jax at module import time before us.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
