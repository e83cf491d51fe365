"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This replaces the reference's "mock carla" trick (SURVEY.md §4): every
component is a pure function testable on CPU, and multi-chip sharding logic is
exercised on virtual devices via --xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
