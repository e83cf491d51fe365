"""BC dataset over the robomimic HDF5 schema, host-side.

Schema contract (vlm_gaze/data_utils/bench2drive_to_hdf5.py:21-56):
    data/demo_i/obs/image                [T, H, W, 3] uint8
    data/demo_i/obs/<gaze_key>           [T, P*2] float32, [0,1] coords, -1 pad
    data/demo_i/actions                  [T, A] float32
    (next_obs/rewards/dones also present; not needed for BC.)

Sampling contract (robomimic SequenceDataset with seq_length=1,
frame_stack=S, front padding): one sample per timestep t, yielding the
window [t-S+1 .. t] clamped to the episode start.

Batches are plain numpy dicts; all heavy preprocessing (heatmaps, grayscale,
stacking) runs on-device inside the jitted train step, so the host only
gathers uint8 windows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class EpisodeStore:
    """In-memory episode arrays."""

    images: list[np.ndarray] = field(default_factory=list)  # each [T,H,W,3] uint8
    gazes: list[np.ndarray] = field(default_factory=list)  # each [T,P*2] f32
    actions: list[np.ndarray] = field(default_factory=list)  # each [T,A] f32

    def add(self, images: np.ndarray, gazes: np.ndarray, actions: np.ndarray):
        t = len(images)
        assert len(gazes) == t and len(actions) == t, "episode stream lengths differ"
        self.images.append(np.ascontiguousarray(images))
        self.gazes.append(np.ascontiguousarray(gazes, dtype=np.float32))
        self.actions.append(np.ascontiguousarray(actions, dtype=np.float32))

    @property
    def n_demos(self) -> int:
        return len(self.images)


def load_hdf5(path: str, gaze_key: str = "gaze_coords", demo_limit: int | None = None,
              cache_images: bool = True) -> EpisodeStore:
    """Read a robomimic-schema HDF5 into an EpisodeStore."""
    import h5py

    store = EpisodeStore()
    with h5py.File(path, "r", swmr=True, libver="latest") as f:
        demos = sorted(f["data"].keys(), key=lambda s: int(s.split("_")[-1]))
        if demo_limit is not None:
            demos = demos[:demo_limit]
        for name in demos:
            g = f["data"][name]
            images = g["obs"]["image"][:] if cache_images else g["obs"]["image"]
            store.add(np.asarray(images), g["obs"][gaze_key][:], g["actions"][:])
    return store


def synthetic_episodes(
    n_demos: int = 4,
    steps: int = 64,
    img_hw: tuple[int, int] = (180, 320),
    max_points: int = 5,
    action_dim: int = 7,
    seed: int = 0,
) -> EpisodeStore:
    """Random episodes with the real schema, for tests and benches."""
    rng = np.random.default_rng(seed)
    store = EpisodeStore()
    h, w = img_hw
    for _ in range(n_demos):
        imgs = rng.integers(0, 256, (steps, h, w, 3), dtype=np.uint8)
        gaze = rng.random((steps, max_points * 2)).astype(np.float32)
        invalid = rng.random((steps, max_points)) < 0.3
        gaze = gaze.reshape(steps, max_points, 2)
        gaze[invalid] = -1.0
        gaze = gaze.reshape(steps, max_points * 2)
        acts = rng.standard_normal((steps, action_dim)).astype(np.float32)
        store.add(imgs, gaze, acts)
    return store


class BCDataset:
    """Windowed BC sampler over an EpisodeStore."""

    def __init__(self, store: EpisodeStore, frame_stack: int = 2):
        self.store = store
        self.frame_stack = int(frame_stack)
        # flat (demo, t) index with front padding (every t is a sample)
        self._index = np.array(
            [(d, t) for d in range(store.n_demos) for t in range(len(store.images[d]))],
            dtype=np.int64,
        )

    def __len__(self) -> int:
        return len(self._index)

    @property
    def n_demos(self) -> int:
        return self.store.n_demos

    def _window(self, demo: int, t: int) -> np.ndarray:
        start = t - (self.frame_stack - 1)
        return np.clip(np.arange(start, t + 1), 0, len(self.store.images[demo]) - 1)

    def sample(self, idxs: np.ndarray) -> dict:
        s = self.frame_stack
        n = len(idxs)
        img0 = self.store.images[0]
        obs = np.empty((n, s, *img0.shape[1:]), dtype=img0.dtype)
        gaze = np.empty((n, s, self.store.gazes[0].shape[-1]), dtype=np.float32)
        acts = np.empty((n, self.store.actions[0].shape[-1]), dtype=np.float32)
        for i, flat in enumerate(idxs):
            d, t = self._index[flat]
            win = self._window(d, t)
            obs[i] = self.store.images[d][win]
            gaze[i] = self.store.gazes[d][win]
            acts[i] = self.store.actions[d][t]
        return {"obs_seq": obs, "gaze_seq": gaze, "actions": acts}

    def iter_batches(self, batch_size: int, rng: np.random.Generator, drop_last: bool = True):
        order = rng.permutation(len(self))
        nb = len(order) // batch_size if drop_last else -(-len(order) // batch_size)
        for b in range(nb):
            yield self.sample(order[b * batch_size : (b + 1) * batch_size])

    def steps_per_epoch(self, batch_size: int, drop_last: bool = True) -> int:
        return len(self) // batch_size if drop_last else -(-len(self) // batch_size)
