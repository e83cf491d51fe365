"""Carry packing (utils/packing.py): identity round-trip + bitwise rollout parity.

The packed scan carry is a pure layout transform (docs/DESIGN.md §7b lever 1);
these tests pin the invariant that makes it safe to enable on the science
path: unpack(pack(x)) is bitwise x, and a packed-carry rollout produces a
bitwise-identical final state to the unpacked one.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gabril_carla_tpu.env.env import DrivingEnv
from gabril_carla_tpu.env.world import build_world_spec
from gabril_carla_tpu.utils.packing import make_carry_packer


def spec_straight():
    wps = np.stack([np.arange(0.0, 120, 2.0), np.zeros(60)], 1).astype(np.float32)
    return jax.tree.map(jnp.asarray, build_world_spec(
        {"id": 5, "town": "T", "waypoints": wps,
         "scenarios": [{"type": "PedestrianCrossing", "trigger": (30.0, 0.0, 0.0)}],
         "weather": [0, 0, 0, 90]}))


def _state():
    env = DrivingEnv()
    return env.reset(spec_straight(), jax.random.PRNGKey(3))


def test_roundtrip_is_bitwise_identity():
    state = _state()
    pack, unpack = make_carry_packer(state)
    back = unpack(pack(state))
    assert jax.tree.structure(back) == jax.tree.structure(state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_groups_are_few_and_flat():
    state = _state()
    pack, _ = make_carry_packer(state)
    packed = pack(state)
    # the whole point: O(dtypes) carry leaves, not O(fields)
    assert len(packed) <= 4 < len(jax.tree.leaves(state))
    assert all(p.ndim == 1 for p in packed)


def test_roundtrip_under_jit_and_vmap():
    state = _state()
    pack, unpack = make_carry_packer(state)
    batched = jax.tree.map(lambda a: jnp.stack([a, a, a]), state)

    @jax.jit
    def rt(s):
        return jax.vmap(lambda x: unpack(pack(x)))(s)

    back = rt(batched)
    for a, b in zip(jax.tree.leaves(batched), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pack_rejects_structure_and_dtype_mismatch():
    import pytest

    state = _state()
    pack, _ = make_carry_packer(state)
    with pytest.raises(ValueError):
        pack((state.ego, state.criteria))
    bad = state.replace(t=state.t.astype(jnp.float32))
    with pytest.raises(ValueError):
        pack(bad)


def test_rollout_packed_vs_unpacked_bitwise(monkeypatch):
    """The science-path invariant: packing the scan carry changes NOTHING."""
    from gabril_carla_tpu.eval import rollout as R
    from gabril_carla_tpu.train.bc import (
        build_bc_models, init_bc_params, make_bc_policy_fn)
    from gabril_carla_tpu.utils import default_bc_config

    cfg = default_bc_config()
    cfg["model"].update(embedding_dim=4, num_hiddens=8, num_residual_layers=1,
                        num_residual_hiddens=4, z_dim=8)
    cfg["training"]["compute_dtype"] = "float32"
    models = build_bc_models(cfg)
    params = init_bc_params(models, cfg, jax.random.PRNGKey(0))
    policy = make_bc_policy_fn(models, cfg)
    spec = spec_straight()
    key = jax.random.PRNGKey(0)

    outs = {}
    for packed in (True, False):
        monkeypatch.setattr(R, "_PACK_CARRY", packed)
        roll = R.make_rollout_fn(lambda p, o, h=None: policy(p, o, h), cfg, steps=25)
        outs[packed] = jax.jit(roll)(spec, params, key)

    sa, sb = outs[True][0], outs[False][0]
    for a, b in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(outs[True][1]), np.asarray(outs[False][1]))
