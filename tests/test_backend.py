"""Guard: tests must run on the virtual CPU mesh, not the tunneled TPU.

A sitecustomize in this image imports jax before conftest; if the
jax.config.update override in conftest ever stops working, every numeric
parity test silently runs at TPU bf16 matmul precision and flakes.
"""

import jax


def test_backend_is_cpu_with_8_devices():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
