"""Confounded-dataset builder: bake action indicators into observations.

Parity with saliency_pipeline/build_confunded_obs.py: overlays a brake dot
and steering bar (per-step recorded actions) onto every frame of an episode
tree, producing the 'confounded' variant used to study causal confusion
(BASELINE.md confounded tables). Pure image op, vectorized on device.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..data.converter import _load_any, coerce_images
    from ..ops.raster import confounded_overlay

    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--out_root", required=True)
    args = p.parse_args(argv)

    overlay = jax.jit(
        jax.vmap(lambda img, act: jax.vmap(confounded_overlay, in_axes=(-1, None), out_axes=-1)(img, act))
    )

    episodes = sorted(p for p in Path(args.dataset_root).glob("route_*/seed_*") if p.is_dir())
    n = 0
    for ep in episodes:
        obs_f = next((ep / f"observations{s}" for s in (".npz", ".npy", ".pt") if (ep / f"observations{s}").exists()), None)
        act_f = next((ep / f"actions{s}" for s in (".npz", ".npy", ".pt") if (ep / f"actions{s}").exists()), None)
        if obs_f is None or act_f is None:
            continue
        imgs = coerce_images(_load_any(obs_f)).astype(np.float32) / 255.0  # [T,H,W,3]
        acts = np.asarray(_load_any(act_f), np.float32)
        conf = np.asarray(overlay(jnp.asarray(imgs), jnp.asarray(acts)))
        out_ep = Path(args.out_root) / ep.parent.name / ep.name
        out_ep.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(out_ep / "observations.npz",
                            observations=(conf * 255).astype(np.uint8))
        np.savez_compressed(out_ep / "actions.npz", actions=acts)
        for extra in ("gaze", "gaze_pseudo", "filter_dynamic", "non_filter"):
            src = next((ep / f"{extra}{s}" for s in (".npz", ".npy", ".pt") if (ep / f"{extra}{s}").exists()), None)
            if src is not None and src.suffix == ".npz":
                (out_ep / src.name).write_bytes(src.read_bytes())
        n += 1
        print(f"confounded {ep} -> {out_ep}")
    print(f"done: {n} episodes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
