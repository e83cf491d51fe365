"""Data layer: native gather parity, HDF5 round trip, converter coercion."""

import numpy as np
import pytest

from gabril_carla_tpu.data import BCDataset, synthetic_episodes
from gabril_carla_tpu.data.converter import coerce_gaze, coerce_images
from gabril_carla_tpu.data.dataset import load_hdf5


def test_native_gather_matches_numpy():
    store = synthetic_episodes(n_demos=3, steps=11, img_hw=(16, 20), max_points=2, seed=3)
    ds_native = BCDataset(store, frame_stack=3, use_native=True)
    store2 = synthetic_episodes(n_demos=3, steps=11, img_hw=(16, 20), max_points=2, seed=3)
    ds_numpy = BCDataset(store2, frame_stack=3, use_native=False)
    if ds_native._native is None:
        pytest.skip("native gather lib unavailable")
    idxs = np.asarray([0, 1, 10, 11, 12, 21, 32])  # episode boundaries + clamps
    a, b = ds_native.sample(idxs), ds_numpy.sample(idxs)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_hdf5_round_trip(tmp_path):
    import h5py

    store = synthetic_episodes(n_demos=2, steps=7, img_hw=(8, 10), max_points=2, seed=1)
    path = tmp_path / "x.hdf5"
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        for i in range(2):
            g = data.create_group(f"demo_{i}")
            g.attrs["num_samples"] = 7
            og = g.create_group("obs")
            og.create_dataset("image", data=store.images[i])
            og.create_dataset("gaze_coords", data=store.gazes[i])
            g.create_dataset("actions", data=store.actions[i])
    loaded = load_hdf5(str(path))
    assert loaded.n_demos == 2
    np.testing.assert_array_equal(loaded.images[1], store.images[1])
    np.testing.assert_array_equal(loaded.actions[0], store.actions[0])


def test_coerce_images_formats():
    t = 4
    # TCHW float [0,1] -> THWC uint8
    x = np.random.default_rng(0).random((t, 3, 6, 8)).astype(np.float32)
    out = coerce_images(x)
    assert out.shape == (t, 6, 8, 3) and out.dtype == np.uint8


def test_coerce_gaze_bbox_and_pixels():
    t, hw = 3, (10, 20)
    # [T, P, 4] pixel bboxes -> centers normalized
    boxes = np.zeros((t, 2, 4), np.float32)
    boxes[:, 0] = [2, 2, 6, 6]  # center (4, 4) px
    boxes[:, 1] = -1
    out = coerce_gaze([b for b in boxes], t, hw, max_points=3).reshape(t, 3, 2)
    np.testing.assert_allclose(out[0, 0], [4 / 19, 4 / 9], atol=1e-6)
    assert np.all(out[:, 2] == -1)


def test_converter_episode_tree(tmp_path):
    from gabril_carla_tpu.data.converter import convert_episodes

    ep = tmp_path / "route_7" / "seed_1"
    ep.mkdir(parents=True)
    rng = np.random.default_rng(0)
    np.savez(ep / "observations.npz", observations=rng.integers(0, 255, (5, 8, 10, 3), dtype=np.uint8))
    np.savez(ep / "actions.npz", actions=rng.random((5, 7)).astype(np.float32))
    np.savez(ep / "gaze.npz", gaze=rng.random((5, 10)).astype(np.float32))
    out = tmp_path / "out.hdf5"
    n = convert_episodes(tmp_path, out, max_gaze_points=5)
    assert n == 1
    store = load_hdf5(str(out), gaze_key="gaze_coords_gaze")
    assert store.images[0].shape == (5, 8, 10, 3)
    assert store.gazes[0].shape == (5, 10)


def test_lazy_hdf5_matches_eager(tmp_path):
    """cache_images=False keeps images on disk (robomimic low_dim/None cache
    parity) and batches match the eager store exactly."""
    import h5py

    store = synthetic_episodes(n_demos=3, steps=9, img_hw=(8, 10), max_points=2, seed=2)
    path = tmp_path / "lazy.hdf5"
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        for i in range(3):
            g = data.create_group(f"demo_{i}")
            og = g.create_group("obs")
            og.create_dataset("image", data=store.images[i])
            og.create_dataset("gaze_coords", data=store.gazes[i])
            g.create_dataset("actions", data=store.actions[i])

    eager = load_hdf5(str(path))
    lazy = load_hdf5(str(path), cache_images=False)
    assert not eager.lazy and lazy.lazy
    assert lazy.flat_images is None  # images really did stay on disk

    ds_e = BCDataset(eager, frame_stack=3)
    ds_l = BCDataset(lazy, frame_stack=3)
    assert ds_l._native is None  # lazy path cannot use the flat-buffer gather
    idxs = np.asarray([0, 1, 8, 9, 20, 26])
    be, bl = ds_e.sample(idxs), ds_l.sample(idxs)
    for k in be:
        np.testing.assert_array_equal(be[k], bl[k])


def test_sparsify_gaze_coords_statistics():
    """Human-statistics transform: one fixation per kept frame, road point
    dropped, blank_frac of frames fully invalid, deterministic under seed."""
    import numpy as np

    from gabril_carla_tpu.data.gaze_stats import sparsify_gaze_coords

    rng = np.random.default_rng(0)
    t, p = 4000, 5
    dense = rng.random((t, p * 2)).astype(np.float32)  # all-valid analytic gaze
    road = dense[:, 0:2].copy()
    hazard = dense[:, 2:4].copy()

    out = sparsify_gaze_coords(dense.copy(), blank_frac=0.35, seed=123)
    kept = out[:, 0] >= 0
    # kept frames carry exactly the top-hazard point in slot 0, -1 elsewhere
    assert np.allclose(out[kept, 0:2], hazard[kept])
    assert np.all(out[:, 2:] == -1.0)
    # the road fixation never survives
    assert not np.allclose(out[kept, 0:2], road[kept])
    # blank fraction within binomial noise of the target
    assert abs(kept.mean() - 0.65) < 0.03
    # deterministic: same seed -> same mask
    out2 = sparsify_gaze_coords(dense.copy(), blank_frac=0.35, seed=123)
    assert np.array_equal(out, out2)


def test_humanize_gaze_coords_statistics():
    """Eye-tracker temporal statistics: piecewise-constant-ish fixations with
    lognormal durations, landing noise vs the instantaneous hazard, episode
    isolation, dropout fraction, determinism."""
    import numpy as np

    from gabril_carla_tpu.data.gaze_stats import (FIX_MAX_S, FIX_MIN_S,
                                                  humanize_gaze_coords)

    rng = np.random.default_rng(1)
    t, p, dt = 6000, 5, 0.05
    dense = (0.2 + 0.6 * rng.random((t, p * 2))).astype(np.float32)
    # the real top-hazard point moves smoothly (a car sliding across the
    # view), not i.i.d. — make it a slow bounded walk so "landed near the
    # onset-time target" is a meaningful property
    walk = np.cumsum(rng.normal(0.0, 0.004, (t, 2)), axis=0)
    dense[:, 2:4] = (0.5 + 0.3 * np.sin(walk + rng.random(2) * 6.28)).astype(np.float32)
    hazard = dense[:, 2:4].copy()
    lengths = np.asarray([2500, 2500, 1000])

    out = humanize_gaze_coords(dense.copy(), lengths=lengths, dt=dt,
                               blank_frac=0.35, seed=7)
    kept = out[:, 0] >= 0
    assert np.all(out[:, 2:] == -1.0)
    assert abs(kept.mean() - 0.65) < 0.03

    # temporally a hold, not a pointer: the recorded gaze must differ from
    # the tick-accurate hazard on most kept frames (the scene moves under a
    # held fixation)...
    err = np.linalg.norm(out[kept, 0:2] - hazard[kept], axis=1)
    assert (err > 1e-4).mean() > 0.99
    # ...but each fixation LANDED near the hazard current at its onset, so
    # the median error stays small (landing sigma + drift + target motion)
    assert np.median(err) < 0.25

    # fixation segmentation on the unblanked signal: recover onsets as
    # frames where the point jumps by more than drift can explain
    full = humanize_gaze_coords(dense.copy(), lengths=lengths, dt=dt,
                                blank_frac=0.0, seed=7)
    for a, b in ((0, 2500), (2500, 5000), (5000, 6000)):
        seg = full[a:b, 0:2]
        jump = np.linalg.norm(np.diff(seg, axis=0), axis=1)
        onsets = np.flatnonzero(jump > 0.03) + 1
        durs = np.diff(np.concatenate([[0], onsets, [b - a]])) * dt
        # median duration in the plausible fixation range, max below clamp
        assert FIX_MIN_S <= np.median(durs) <= 2.0 * FIX_MAX_S
        # enough saccades happened for the duration model to be real
        assert len(onsets) >= (b - a) * dt / 1.5

    # determinism
    out2 = humanize_gaze_coords(dense.copy(), lengths=lengths, dt=dt,
                                blank_frac=0.35, seed=7)
    assert np.array_equal(out, out2)
