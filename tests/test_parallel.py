"""Multi-device data parallelism on the virtual 8-CPU mesh.

Replaces the reference's torchrun 4-GPU smoke test
(test/test_ddp_train_one_epoch.py) with an equivalence check: a train step
over an 8-way sharded batch must match the single-device step bit-for-bit
(deterministic math, replicated params, XLA-inserted psum).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gabril_carla_tpu.data import BCDataset, synthetic_episodes
from gabril_carla_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from gabril_carla_tpu.train import init_bc_state, make_bc_train_step
from gabril_carla_tpu.train.optim import build_optimizer
from gabril_carla_tpu.utils import default_bc_config


def small_cfg():
    cfg = default_bc_config()
    cfg["data"].update(img_height=24, img_width=48, frame_stack=2, batch_size=16)
    cfg["model"].update(embedding_dim=8, num_hiddens=16, num_residual_layers=1,
                        num_residual_hiddens=8, z_dim=16)
    # plain BC: the GABRIL-Reg loss min-max-normalizes a tiny softmax range,
    # which amplifies f32 shard-summation noise past any honest tolerance
    cfg["gaze"].update(method="None", max_points=3, mask_sigma=4.0)
    cfg["training"].update(compute_dtype="float32")
    cfg["scheduler"]["type"] = "none"
    return cfg


def test_sharded_step_matches_single_device():
    cfg = small_cfg()
    store = synthetic_episodes(n_demos=2, steps=16, img_hw=(24, 48), max_points=3)
    ds = BCDataset(store, frame_stack=2)
    batch_np = ds.sample(np.arange(16))

    tx = build_optimizer(cfg.optimizer, cfg.scheduler, cfg.training, steps_per_epoch=2)
    models, state0 = init_bc_state(cfg, jax.random.PRNGKey(0), tx)
    step = make_bc_train_step(models, cfg, donate=False)
    rng = jax.random.PRNGKey(7)

    # single device
    batch1 = jax.tree.map(jnp.asarray, batch_np)
    s1, m1 = step(state0, batch1, rng)

    # 8-way sharded batch, replicated params
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    state_r = jax.device_put(state0, replicated_sharding(mesh))
    batch8 = shard_batch(batch_np, mesh)
    s8, m8 = step(state_r, batch8, rng)

    # cross-shard reduction order shifts f32 sums by ~1e-5 relative
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-4)

    # gradients must agree across shardings (adam's sign-normalized first
    # step amplifies sub-1e-6 grad noise to ~lr, so compare grads, not params)
    from gabril_carla_tpu.train.bc import bc_loss_fn

    gfun = jax.jit(jax.grad(lambda p, b: bc_loss_fn(p, models, cfg, b, rng)[0]))
    g1 = gfun(state0.params, batch1)
    g8 = gfun(state_r.params, batch8)
    ok = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4), g1, g8
    )
    assert all(jax.tree.leaves(ok))


def test_shard_batch_pads_ragged():
    mesh = make_mesh()
    batch = {"x": np.arange(10, dtype=np.float32)[:, None]}
    out = shard_batch(batch, mesh)
    assert out["x"].shape[0] == 16  # padded to multiple of 8
    np.testing.assert_array_equal(np.asarray(out["x"][:10, 0]), np.arange(10))


def test_maybe_init_distributed_noop_single_host(monkeypatch):
    from gabril_carla_tpu.parallel import maybe_init_distributed

    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    assert maybe_init_distributed() is False


def test_multislice_mesh_psum():
    """make_multislice_mesh: 'model' within a slice, 'data' across; a psum
    over both axes sees every device exactly once."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gabril_carla_tpu.parallel.mesh import make_multislice_mesh

    mesh = make_multislice_mesh(model=2)
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] == len(jax.devices()) // 2

    def body(x):
        return jax.lax.psum(jax.lax.psum(x, "data"), "model")

    out = jax.shard_map(body, mesh=mesh, in_specs=P("data", "model"),
                        out_specs=P("data", "model"))(
        jnp.ones((mesh.shape["data"], mesh.shape["model"])))
    assert (jax.device_get(out) == len(jax.devices())).all()
