"""Multi-host initialization (the torchrun/NCCL analogue).

The reference detects torchrun's env (RANK/WORLD_SIZE/LOCAL_RANK) and opens
an NCCL process group (vlm_gaze/train/common/distributed.py:11-47). The JAX
equivalent is one `jax.distributed.initialize()` call per host before any
backend touch; afterwards `jax.devices()` spans the whole slice/pod and the
('data', 'model') mesh helpers in mesh.py shard across it transparently —
gradient psums ride ICI within a slice and DCN across slices
(make_multislice_mesh).

Single-host runs skip initialization entirely (the default everywhere in
this repo), so every CLI stays runnable without a launcher.
"""

from __future__ import annotations

import os

import jax

_ENV_KEYS = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")


def maybe_init_distributed(verbose: bool = True) -> bool:
    """Initialize jax.distributed when launched under a multi-host launcher.

    Detection mirrors the reference's torchrun-env sniffing: a coordinator
    address in the environment (set by the launcher or the TPU pod runtime)
    opts in; otherwise this is a single-host run and a no-op. Returns True
    when the distributed runtime was initialized.

    Env contract (either spelling):
      COORDINATOR_ADDRESS  host:port of process 0
      NUM_PROCESSES        world size (default: auto on TPU pods)
      PROCESS_ID           this host's rank (default: auto on TPU pods)
    """
    addr = next((os.environ[k] for k in _ENV_KEYS if k in os.environ), None)
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES") is not None
    if addr is None and not on_pod:
        return False
    kwargs = {}
    if addr is not None:
        kwargs["coordinator_address"] = addr
    if "NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
    if "PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    if verbose:
        print(
            f"jax.distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices",
            flush=True,
        )
    return True
