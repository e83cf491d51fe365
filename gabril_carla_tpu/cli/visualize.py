"""Dataset visualization: 3-panel (image | gaze heatmap | overlay) GIFs.

Parity with train_data_viz.py (vlm_gaze/data_utils/train_data_viz.py: GIF of
image/heatmap/overlay triptychs from HDF5 through the GazePreprocessor) and
plot_gaze_and_obs (data_utils/utils.py:71-113).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def triptych(image_u8: np.ndarray, heat: np.ndarray) -> np.ndarray:
    """[H,W,3] uint8 + [H,W] float -> side-by-side panel [H, 3W, 3] uint8."""
    img = image_u8.astype(np.float32) / 255.0
    h3 = np.stack([heat] * 3, -1)
    overlay = img * h3
    panel = np.concatenate([img, h3, overlay], axis=1)
    return (np.clip(panel, 0, 1) * 255).astype(np.uint8)


def main(argv=None):
    import jax.numpy as jnp

    from ..data.dataset import load_hdf5
    from ..ops.heatmap import GazeHeatmapper

    p = argparse.ArgumentParser()
    p.add_argument("--hdf5", required=True)
    p.add_argument("--demo", type=int, default=0)
    p.add_argument("--gaze_key", default="gaze_coords")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--stride", type=int, default=2)
    p.add_argument("--sigma", type=float, default=30.0)
    p.add_argument("--out", default="viz.gif")
    args = p.parse_args(argv)

    store = load_hdf5(args.hdf5, gaze_key=args.gaze_key, demo_limit=args.demo + 1)
    imgs = store.images[args.demo][: args.frames * args.stride : args.stride]
    gaze = store.gazes[args.demo][: args.frames * args.stride : args.stride]
    h, w = imgs.shape[1:3]
    hm = GazeHeatmapper(img_height=h, img_width=w, gaze_sigma=args.sigma,
                        maxpoints=gaze.shape[-1] // 2)
    heat = np.asarray(hm.heatmaps(jnp.asarray(gaze[None]))[0])  # [T, H, W]

    panels = [triptych(imgs[i], heat[i]) for i in range(len(imgs))]
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    frames = [Image.fromarray(p) for p in panels]
    frames[0].save(out, save_all=True, append_images=frames[1:], duration=100, loop=0)
    print(f"wrote {len(frames)}-frame GIF to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
