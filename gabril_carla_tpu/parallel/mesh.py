"""Device mesh + sharding helpers.

The reference's parallelism story is single-node data parallelism (torch DDP
over NCCL, vlm_gaze/train/common/distributed.py:28-43). The TPU-native
equivalent is a ('data', 'model') mesh: batches sharded over 'data', params
replicated (these models are ~10M params), gradients psum'd by XLA over ICI.
The 'model' axis is reserved for larger variants and is size 1 by default.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data: int | None = None, model: int = 1) -> Mesh:
    """Create a ('data', 'model') mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def make_multislice_mesh(model: int = 1) -> Mesh:
    """Multi-slice mesh: 'data' spans slices (DCN), 'model' stays inside a
    slice (ICI) — gradient psums ride DCN once per step while any model
    collectives stay on ICI. Call jax.distributed.initialize() first on
    multi-host deployments; device order from jax.devices() already groups
    by slice, so a row-major reshape lands 'model' within-slice.
    """
    devices = jax.devices()
    return make_mesh(devices, data=len(devices) // model, model=model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dimension sharding over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with batch-dim sharding over 'data'.

    Pads the batch dim up to a multiple of the data-axis size if needed
    (repeat-last policy keeps loss weighting approximately unchanged).
    """
    n = mesh.shape["data"]
    sh = batch_sharding(mesh)

    def put(x):
        b = x.shape[0]
        rem = (-b) % n
        if rem:
            x = np.concatenate([x, np.repeat(x[-1:], rem, axis=0)], axis=0)
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)
