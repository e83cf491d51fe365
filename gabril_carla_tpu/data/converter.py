"""Episode-directory -> robomimic-schema HDF5 converter.

Rebuild of bench2drive_to_hdf5.py (vlm_gaze/data_utils/bench2drive_to_hdf5.py):
walks <root>/route_*/seed_*/ episode dirs, coerces observations to uint8
[T,H,W,3], normalizes the gaze variants to [T, max_points*2] float32 with -1
padding (pixel->[0,1] autodetection, bbox->center for [P,4] boxes), and writes
data/demo_i/{obs,next_obs,actions,rewards,dones} with chunked compression.
Episode payloads are .npz (torch .pt also readable when torch is present).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np

GAZE_VARIANTS = {
    "gaze": "gaze_coords_gaze",
    "gaze_pseudo": "gaze_coords_gaze_pseudo",
    "filter_dynamic": "gaze_coords_filter_dynamic",
    "non_filter": "gaze_coords_non_filter",
}
LEGACY_ALIAS = "gaze_coords"


def _load_any(path: Path):
    """Load .npz/.npy/.pt episode payloads into numpy."""
    if path.suffix == ".npz":
        z = np.load(path, allow_pickle=True)
        return {k: z[k] for k in z.files} if len(z.files) > 1 else z[z.files[0]]
    if path.suffix == ".npy":
        return np.load(path, allow_pickle=True)
    if path.suffix == ".pt":
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        return _torch_to_numpy(obj)
    raise ValueError(f"unsupported episode payload: {path}")


def _torch_to_numpy(obj):
    import torch

    if isinstance(obj, torch.Tensor):
        return obj.numpy()
    if isinstance(obj, dict):
        return {k: _torch_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_torch_to_numpy(v) for v in obj]
    return obj


def coerce_images(obs) -> np.ndarray:
    """-> uint8 [T, H, W, 3] (converter :188-263 semantics)."""
    if isinstance(obs, dict):
        obs = obs.get("observations", obs.get("obs", next(iter(obs.values()))))
    arr = np.asarray(obs)
    if arr.ndim == 4 and arr.shape[1] == 3 and arr.shape[-1] != 3:
        arr = np.transpose(arr, (0, 2, 3, 1))  # TCHW -> THWC
    if arr.dtype != np.uint8:
        mx = float(arr.max()) if arr.size else 1.0
        arr = (arr * 255.0).clip(0, 255).astype(np.uint8) if mx <= 1.5 else arr.clip(0, 255).astype(np.uint8)
    assert arr.ndim == 4 and arr.shape[-1] == 3, f"bad image shape {arr.shape}"
    return arr


def coerce_gaze(raw, t: int, hw: tuple[int, int], max_points: int = 5) -> np.ndarray:
    """-> float32 [T, max_points*2], coords in [0,1], -1 fill (:269-363).

    Accepts per-step lists of points, [T,P,2] arrays, [T,P,4] boxes
    (converted to centers), pixel or normalized coordinates.
    """
    h, w = hw
    out = np.full((t, max_points, 2), -1.0, dtype=np.float32)
    if raw is None:
        return out.reshape(t, max_points * 2)
    if isinstance(raw, dict):
        raw = raw.get("gaze", next(iter(raw.values())))

    def put(i, pts):
        pts = np.asarray(pts, dtype=np.float32).reshape(-1, pts_dim)
        if pts_dim == 4:  # bbox -> center
            pts = np.stack([(pts[:, 0] + pts[:, 2]) / 2, (pts[:, 1] + pts[:, 3]) / 2], 1)
        valid = pts[(pts[:, 0] >= 0) & (pts[:, 1] >= 0)][:max_points]
        if len(valid) and valid.max() > 1.5:  # pixel coords -> [0,1]
            valid = valid / np.asarray([w - 1, h - 1], dtype=np.float32)
        out[i, : len(valid)] = np.clip(valid, 0.0, 1.0)

    if isinstance(raw, (list, tuple)):
        for i, step in enumerate(raw[:t]):
            if step is None or (hasattr(step, "__len__") and len(step) == 0):
                continue
            step_arr = np.asarray(step, dtype=np.float32)
            pts_dim = 4 if (step_arr.ndim == 2 and step_arr.shape[-1] == 4) else 2
            put(i, step_arr)
    else:
        arr = np.asarray(raw, dtype=np.float32)
        if arr.ndim == 2 and arr.shape[-1] in (2, max_points * 2):
            arr = arr.reshape(t, -1, 2) if arr.shape[-1] != 2 else arr[:, None, :]
        pts_dim = arr.shape[-1] if arr.ndim == 3 else 2
        for i in range(min(t, len(arr))):
            put(i, arr[i])
    return out.reshape(t, max_points * 2)


def convert_episodes(
    dataset_root: str | Path,
    output_hdf5: str | Path,
    max_gaze_points: int = 5,
    action_dim: int = 7,
    compression: str | None = "lzf",
    chunk_len: int = 256,
    limit_episodes: int | None = None,
    include_routes: list[str] | None = None,
) -> int:
    """Walk route_*/seed_* episode dirs, emit one robomimic HDF5. Returns #demos."""
    import h5py

    root = Path(dataset_root)
    episodes = sorted(
        p for p in root.glob("route_*/seed_*") if p.is_dir()
        and (not include_routes or p.parent.name in include_routes)
    )
    if limit_episodes:
        episodes = episodes[:limit_episodes]

    out = Path(output_hdf5)
    out.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with h5py.File(out, "w") as f:
        data = f.create_group("data")
        total = 0
        for ep in episodes:
            obs_file = next((ep / f"observations{s}" for s in (".npz", ".npy", ".pt")
                             if (ep / f"observations{s}").exists()), None)
            act_file = next((ep / f"actions{s}" for s in (".npz", ".npy", ".pt")
                             if (ep / f"actions{s}").exists()), None)
            if obs_file is None or act_file is None:
                continue
            images = coerce_images(_load_any(obs_file))
            t = len(images)
            actions = np.asarray(_load_any(act_file), dtype=np.float32).reshape(t, -1)[:, :action_dim]
            g = data.create_group(f"demo_{n}")
            g.attrs["num_samples"] = t
            chunk = (min(chunk_len, t), *images.shape[1:])
            obs_g, next_g = g.create_group("obs"), g.create_group("next_obs")
            obs_g.create_dataset("image", data=images, chunks=chunk, compression=compression)
            next_images = np.concatenate([images[1:], images[-1:]], axis=0)
            next_g.create_dataset("image", data=next_images, chunks=chunk, compression=compression)

            hw = images.shape[1:3]
            wrote_legacy = False
            for stem, key in GAZE_VARIANTS.items():
                src = next((ep / f"{stem}{s}" for s in (".npz", ".npy", ".pt")
                            if (ep / f"{stem}{s}").exists()), None)
                coords = coerce_gaze(_load_any(src) if src else None, t, hw, max_gaze_points)
                obs_g.create_dataset(key, data=coords)
                next_g.create_dataset(key, data=np.concatenate([coords[1:], coords[-1:]], 0))
                if stem == "gaze" and src is not None and not wrote_legacy:
                    obs_g.create_dataset(LEGACY_ALIAS, data=coords)
                    next_g.create_dataset(LEGACY_ALIAS, data=np.concatenate([coords[1:], coords[-1:]], 0))
                    wrote_legacy = True
            if not wrote_legacy:
                z = np.full((t, max_gaze_points * 2), -1.0, np.float32)
                obs_g.create_dataset(LEGACY_ALIAS, data=z)
                next_g.create_dataset(LEGACY_ALIAS, data=z)

            g.create_dataset("actions", data=actions)
            g.create_dataset("rewards", data=np.zeros((t, 1), np.float32))
            dones = np.zeros((t, 1), np.float32)
            dones[-1] = 1.0
            g.create_dataset("dones", data=dones)
            total += t
            n += 1
        data.attrs["total"] = total
        f.attrs["env_args"] = json.dumps({"env_name": "bench2drive_tpu", "type": 1})
    return n
