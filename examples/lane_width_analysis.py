"""Per-town lane-width recovery from the benchmark data itself.

The OpenDRIVE map binaries are external even for the reference (its
GlobalRoutePlanner reads them from the CARLA server,
vlm_gaze/eval/srunner/.../global_route_planner.py:19-118), so this
framework's lane geometry is synthesized around the route polyline with a
single LANE_WIDTH constant (env/constants.py). VERDICT r4 missing-item 4
asks: extract what IS recoverable from the data in the checkout and
document the per-town error. Two independent estimators, no map needed:

1. **Anti-parallel route separation.** Where two benchmark route polylines
   (or two passes of one route) run the same road in opposite directions,
   the centerline-to-centerline distance of the opposing lane pair equals
   one lane width on two-lane roads (and a multiple on wider ones). We
   histogram nearest anti-parallel separations in [2, 12] m per town and
   report the dominant mode.

2. **Parked-slot lateral offsets** (Town12/13 only, the towns with parked
   tables). Parked vehicles sit just outside the outermost driving lane;
   the lateral offset |d| from the nearest route centerline clusters at
   (k + 1/2) x lane_width + margin. The spacing between adjacent offset
   clusters re-estimates the lane width without knowing k.

Output: a per-town table (estimate, support, delta vs LANE_WIDTH=3.5) —
cited by docs/PARITY.md's lane-geometry note.

    python examples/lane_width_analysis.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gabril_carla_tpu.data.vendored import (BENCHMARK_DIR, load_parked_npz,  # noqa: E402
                                            load_routes_json,
                                            parked_tables_path)
from gabril_carla_tpu.env import constants as C  # noqa: E402
from gabril_carla_tpu.env.world import resample_polyline  # noqa: E402


def polyline_dirs(xy: np.ndarray) -> np.ndarray:
    d = np.gradient(xy, axis=0)
    n = np.linalg.norm(d, axis=1, keepdims=True)
    return d / np.maximum(n, 1e-6)


def antiparallel_separations(polys: list[np.ndarray], max_pts: int = 4000,
                             seed: int = 0) -> np.ndarray:
    """Nearest anti-parallel centerline separations, pooled over a town."""
    xy = np.concatenate(polys, axis=0)
    dirs = np.concatenate([polyline_dirs(p) for p in polys], axis=0)
    rng = np.random.default_rng(seed)
    if len(xy) > max_pts:
        sel = rng.choice(len(xy), max_pts, replace=False)
        q_xy, q_dir = xy[sel], dirs[sel]
    else:
        q_xy, q_dir = xy, dirs
    seps = []
    # block the distance matrix to stay in memory
    for i in range(0, len(q_xy), 512):
        q, qd = q_xy[i:i + 512], q_dir[i:i + 512]
        d2 = ((q[:, None, :] - xy[None, :, :]) ** 2).sum(-1)  # [b, N]
        anti = (qd @ dirs.T) < -0.95
        near = (d2 > 2.0 ** 2) & (d2 < 12.0 ** 2) & anti
        d2 = np.where(near, d2, np.inf)
        j = d2.argmin(axis=1)
        dmin = np.sqrt(d2[np.arange(len(q)), j])
        ok = np.isfinite(dmin)
        # lateral component only (reject skewed matches at junctions)
        rel = xy[j[ok]] - q[ok]
        lat = np.abs(qd[ok, 0] * rel[:, 1] - qd[ok, 1] * rel[:, 0])
        seps.append(lat)
    return np.concatenate(seps) if seps else np.zeros(0)


def mode_estimate(vals: np.ndarray, lo=2.0, hi=6.0, bw=0.1):
    """Histogram mode in [lo, hi] with a parabolic refinement."""
    vals = vals[(vals >= lo) & (vals <= hi)]
    if len(vals) < 30:
        return None, len(vals)
    bins = np.arange(lo, hi + bw, bw)
    h, e = np.histogram(vals, bins=bins)
    k = int(h.argmax())
    # 3-point parabolic peak interpolation
    if 0 < k < len(h) - 1 and (h[k - 1] - 2 * h[k] + h[k + 1]) != 0:
        off = 0.5 * (h[k - 1] - h[k + 1]) / (h[k - 1] - 2 * h[k] + h[k + 1])
    else:
        off = 0.0
    return float(e[k] + (0.5 + off) * bw), int(h[k])


def parked_offsets(parked: np.ndarray, polys: list[np.ndarray]) -> np.ndarray:
    xy = np.concatenate(polys, axis=0)
    dirs = np.concatenate([polyline_dirs(p) for p in polys], axis=0)
    out = []
    for i in range(0, len(parked), 1024):
        p = parked[i:i + 1024, :2]
        d2 = ((p[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
        j = d2.argmin(axis=1)
        rel = p - xy[j]
        lat = np.abs(dirs[j, 0] * rel[:, 1] - dirs[j, 1] * rel[:, 0])
        dist = np.sqrt(d2[np.arange(len(p)), j])
        out.append(lat[dist < 25.0])
    return np.concatenate(out) if out else np.zeros(0)


def cluster_spacing(offsets: np.ndarray) -> float | None:
    """Lane width from the spacing of parked-offset clusters: the offset
    density is ~periodic in lane width; read the period off the
    autocorrelation of its histogram."""
    if len(offsets) < 200:
        return None
    bw = 0.1
    h, _ = np.histogram(offsets, bins=np.arange(0.0, 15.0 + bw, bw))
    h = h - h.mean()
    ac = np.correlate(h, h, mode="full")[len(h) - 1:]
    # first local max in lag range [2.5, 4.5] m
    lags = np.arange(len(ac)) * bw
    band = (lags >= 2.5) & (lags <= 4.5)
    if not band.any():
        return None
    return float(lags[band][ac[band].argmax()])


def main():
    routes = load_routes_json(BENCHMARK_DIR / "routes220.json.gz")
    towns: dict[str, list[np.ndarray]] = {}
    for r in routes.values():
        towns.setdefault(r["town"], []).append(
            resample_polyline(r["waypoints"], 1.0))

    pk = parked_tables_path()
    parked = load_parked_npz(pk) if pk and str(pk).endswith(".npz") else {}

    print(f"LANE_WIDTH constant in use: {C.LANE_WIDTH} m "
          "(env/constants.py)\n")
    print("| Town | routes | anti-parallel mode (m) | support | "
          "parked-cluster period (m) | Δ vs 3.5 |")
    print("|---|---|---|---|---|---|")
    worst = 0.0
    for town in sorted(towns):
        polys = towns[town]
        est, support = mode_estimate(antiparallel_separations(polys))
        per = cluster_spacing(parked_offsets(parked[town], polys)) if town in parked else None
        best = est if est is not None else per
        delta = (best - C.LANE_WIDTH) if best is not None else None
        if delta is not None:
            worst = max(worst, abs(delta))
        print(f"| {town} | {len(polys)} | "
              f"{'—' if est is None else f'{est:.2f}'} | {support} | "
              f"{'—' if per is None else f'{per:.2f}'} | "
              f"{'—' if delta is None else f'{delta:+.2f}'} |")
    print(f"\nworst-case |Δ| over towns with support: {worst:.2f} m")
    return 0


if __name__ == "__main__":
    sys.exit(main())
