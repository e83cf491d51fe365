"""Human-gaze-statistics transforms for analytic gaze coordinates.

The analytic gaze (ops/raster.py:analytic_gaze) is dense and noiseless: a
road fixation plus hazard-ranked actor points on EVERY frame, each a
deterministic function of scene state. Human/VLM gaze — what the reference
trains on (vlm_gaze/train/train_gaze_predictor.py:83-101, gaze variants in
data_utils/bench2drive_to_hdf5.py:269-327) — is sparse: roughly one foveal
fixation per frame, with blink/saccade/tracker-dropout frames carrying no
valid sample at all.

That density difference is load-bearing for two published results:

* table 3 (gaze-ratio ablation, draw_plot/data/table3.csv) only shows a
  rising trend under sparse gaze — dense gaze saturates the regularizer at
  25% coverage (RESULTS.md round-2/3 analysis);
* GRIL's score band (~= BC, draw_plot/data/Original.csv:4-5) assumes the
  coordinate-regression target is noisy human gaze; regressing noiseless
  analytic coordinates extracts strictly more signal and over-performs.

`sparsify_gaze_coords` converts dense analytic gaze into a
human-statistics-matched stream: keep the single top-hazard fixation, drop
the constant road point, and blank a fraction of frames entirely. It is a
host-side dataset transform (numpy, applied once after collection) — the
device pipeline is unchanged, so every gaze method consumes it through the
normal heatmap/coordinate paths.
"""

from __future__ import annotations

import numpy as np

# Fraction of frames with no valid gaze sample. Matched to eye-tracker
# practice rather than fit to results: Gazepoint-class trackers lose
# 25-45% of driving-task frames to blinks/saccades/off-screen glances
# (the reference's HumanAgent holds the last valid point for display but
# logs the raw invalid samples, eval/my_agents/human_agent.py:203-206).
BLANK_FRAC = 0.35


def sparsify_gaze_coords(
    gazes: np.ndarray,
    blank_frac: float = BLANK_FRAC,
    fixation_slice: slice = slice(2, 4),
    seed: int = 123,
) -> np.ndarray:
    """Dense analytic gaze [T, P*2] -> sparse human-statistics gaze, in place.

    gazes: flat coordinate rows, [0,1] image coords with -1 padding
           (bench2drive_to_hdf5.py:269-327 schema). Column layout of the
           analytic gaze: point 0 = road fixation, point 1 = top-hazard
           actor, further points = lower-ranked hazards.
    fixation_slice: columns of the one fixation to keep (default: the
           top-hazard actor, coords 2:4).
    blank_frac: fraction of frames blanked to -1 entirely (tracker dropout).
    seed: RNG seed for the dropout mask. Callers should thread a
           run-specific seed (e.g. the dataset or training seed) so suite
           variants don't all share one dropout pattern; the default only
           keeps single-call usage deterministic.

    Returns the same array (mutated) for chaining.
    """
    sparse = np.full_like(gazes, -1.0)
    sparse[:, 0:2] = gazes[:, fixation_slice]
    rng = np.random.default_rng(seed)
    sparse[rng.random(len(gazes)) < blank_frac] = -1.0
    gazes[:] = sparse
    return gazes


# ---- eye-tracker temporal statistics (humanize_gaze_coords defaults).
# Values are taken from the eye-movements-in-driving literature, not fit to
# benchmark results:
#   * fixation durations in driving cluster at a ~300 ms median with a
#     right-skewed (lognormal) tail out past 1 s;
#   * saccade landing + tracker accuracy error is ~1-2 deg visual angle;
#     at the 320-px-wide ~90 deg FOV chase camera 1 deg ~ 1.1% of image
#     width, so the combined sigma is ~1.5% of width;
#   * intra-fixation drift/microsaccades + tracker jitter ~0.3 deg.
FIX_MEDIAN_S = 0.30
FIX_LOG_SIGMA = 0.6
FIX_MIN_S, FIX_MAX_S = 0.08, 1.2
SIGMA_LAND = 0.015
SIGMA_DRIFT = 0.004


def humanize_gaze_coords(
    gazes: np.ndarray,
    lengths: np.ndarray | None = None,
    dt: float = 0.05,
    blank_frac: float = BLANK_FRAC,
    fixation_slice: slice = slice(2, 4),
    fallback_slice: slice = slice(0, 2),
    seed: int = 123,
) -> np.ndarray:
    """Dense analytic gaze [T, P*2] -> eye-tracker-statistics stream, in place.

    Where :func:`sparsify_gaze_coords` matches human gaze's *spatial* density
    (one fixation, dropout frames), the recorded point it keeps still tracks
    the top hazard tick-accurately — temporally it stays a noiseless pointer.
    Real point-of-regard data is piecewise constant: the eye saccades to a
    target, lands with error, then HOLDS that screen position for a
    fixation-duration-distributed interval (drifting slightly) while the
    scene moves on underneath. This transform reproduces those statistics:

      * saccade onsets drawn from a lognormal fixation-duration distribution
        (median ``FIX_MEDIAN_S``, clamped to [80 ms, 1.2 s]),
      * at each onset the new target is the CURRENT top-hazard point
        (``fixation_slice``; the road point ``fallback_slice`` when no
        hazard is valid) plus isotropic landing/tracker noise ``SIGMA_LAND``,
      * between onsets the recorded gaze holds the landed position with
        per-frame drift ``SIGMA_DRIFT`` — it does not track the target,
      * ``blank_frac`` of frames are invalidated entirely (blinks/dropout),
        matching the tracker-validity statistics of sparsify_gaze_coords.

    ``lengths``: per-episode frame counts (EpisodeStore.lengths); fixations
    never span an episode boundary. One episode is assumed when omitted.
    Returns the same array (mutated) for chaining.
    """
    rng = np.random.default_rng(seed)
    tgt = gazes[:, fixation_slice].copy()
    fb = gazes[:, fallback_slice].copy()
    no_hazard = (tgt < 0.0).any(axis=1)
    tgt[no_hazard] = fb[no_hazard]
    out = np.full_like(gazes, -1.0)

    if lengths is None:
        lengths = np.asarray([len(gazes)], np.int64)
    start = 0
    for n in np.asarray(lengths, np.int64):
        t = start
        while t < start + n:
            dur_s = float(np.clip(
                FIX_MEDIAN_S * np.exp(rng.normal(0.0, FIX_LOG_SIGMA)),
                FIX_MIN_S, FIX_MAX_S))
            dur = max(1, int(round(dur_s / dt)))
            end = min(t + dur, start + int(n))
            point = tgt[t]
            if (point >= 0.0).all():
                land = np.clip(point + rng.normal(0.0, SIGMA_LAND, 2), 0.0, 1.0)
                drift = np.cumsum(rng.normal(0.0, SIGMA_DRIFT, (end - t, 2)), axis=0)
                out[t:end, 0:2] = np.clip(land[None] + drift, 0.0, 1.0)
            t = end
        start += int(n)

    out[rng.random(len(gazes)) < blank_frac] = -1.0
    gazes[:] = out
    return gazes


# ---- semantic misperception (misperceive_gaze_coords defaults). The rung
# ABOVE temporal statistics in the gaze-realism ladder (RESULTS.md): where
# humanize_gaze_coords degrades the *sampling* of a perfect hazard pointer,
# this degrades the *supervision content itself* — the fixated target is
# sometimes the wrong actor or no hazard at all, modeling human
# misperception rather than tracker noise. Constants are taken from the
# hazard-perception literature, not fit to benchmark results:
#   * scripted-hazard studies consistently find a 20-40% share of hazards
#     that receive no (timely) fixation even from attentive drivers, and
#     experienced drivers still foveate non-hazard vehicles/clutter a
#     substantial fraction of scanning time;
#   * attention lapses / mind-wandering episodes occupy O(10%) of driving
#     time in on-road self-report + gaze studies, during which gaze parks
#     on the road ahead regardless of events.
P_LAPSE = 0.12     # per-fixation probability of an attention lapse
P_WRONG = 0.30     # probability the chosen fixation is NOT the top hazard
SIGMA_CONFUSE = 0.15  # screen-distance scale of wrong-actor confusion
                      # (fraction of image width): confusion is biased
                      # toward actors NEAR the true hazard (crowding), not
                      # uniform over the scene


def misperceive_gaze_coords(
    gazes: np.ndarray,
    lengths: np.ndarray | None = None,
    dt: float = 0.05,
    blank_frac: float = BLANK_FRAC,
    p_lapse: float = P_LAPSE,
    p_wrong: float = P_WRONG,
    sigma_confuse: float = SIGMA_CONFUSE,
    seed: int = 123,
) -> np.ndarray:
    """Dense analytic gaze [T, P*2] -> SEMANTICALLY-ERRED eye-tracker stream.

    A strict superset of :func:`humanize_gaze_coords` (same lognormal
    fixation durations, saccade landing noise, intra-fixation hold+drift,
    tracker dropout), differing only in *which point* each saccade targets:

      * with probability ``p_lapse`` the fixation is an attention lapse —
        gaze parks on the road point (analytic column 0) for the whole
        fixation, regardless of hazards;
      * otherwise, with probability ``p_wrong`` (and >= 2 valid actors) the
        target is a WRONG actor, sampled among the non-top hazard points
        with weights exp(-d/sigma_confuse) for screen distance d to the
        true top hazard — confusion concentrates on nearby/cluttered
        actors;
      * otherwise the top hazard, as in humanize_gaze_coords.

    The supervision content therefore no longer equals the causal hazard
    state: a regressor (GRIL) or gate (GMD) consuming this stream faces the
    same information ceiling as one trained on real human fixations —
    reactions correlated with, not equal to, the hazard state. This is the
    next rung the round-4 ladder identified (RESULTS.md: the GRIL/GMD
    over-performance survives matched sampling statistics; only changing
    the supervision itself can close it). Reference gaze sources:
    vlm_gaze/eval/sensor.py:6-62 (Gazepoint), saliency_pipeline (VLM).

    Column layout as in the analytic gaze: point 0 = road fixation, points
    1.. = hazard-ranked actors; -1 padding marks invalid points.
    Returns the same array (mutated) for chaining.
    """
    rng = np.random.default_rng(seed)
    n_pts = gazes.shape[1] // 2
    pts = gazes.reshape(len(gazes), n_pts, 2)
    road = pts[:, 0].copy()
    actors = pts[:, 1:].copy()  # [T, P-1, 2], rank 0 = top hazard
    out = np.full_like(gazes, -1.0)

    if lengths is None:
        lengths = np.asarray([len(gazes)], np.int64)
    start = 0
    for n in np.asarray(lengths, np.int64):
        t = start
        while t < start + n:
            dur_s = float(np.clip(
                FIX_MEDIAN_S * np.exp(rng.normal(0.0, FIX_LOG_SIGMA)),
                FIX_MIN_S, FIX_MAX_S))
            dur = max(1, int(round(dur_s / dt)))
            end = min(t + dur, start + int(n))

            valid = (actors[t] >= 0.0).all(axis=1)
            point = None
            if rng.random() < p_lapse or not valid.any():
                if (road[t] >= 0.0).all():
                    point = road[t]
            elif rng.random() < p_wrong and valid.sum() >= 2:
                top = actors[t, np.argmax(valid)]  # first valid = top rank
                others = np.flatnonzero(valid)[1:]
                d = np.linalg.norm(actors[t, others] - top[None], axis=1)
                w = np.exp(-d / sigma_confuse)
                point = actors[t, rng.choice(others, p=w / w.sum())]
            else:
                point = actors[t, np.argmax(valid)]

            if point is not None and (point >= 0.0).all():
                land = np.clip(point + rng.normal(0.0, SIGMA_LAND, 2), 0.0, 1.0)
                drift = np.cumsum(rng.normal(0.0, SIGMA_DRIFT, (end - t, 2)), axis=0)
                out[t:end, 0:2] = np.clip(land[None] + drift, 0.0, 1.0)
            t = end
        start += int(n)

    out[rng.random(len(gazes)) < blank_frac] = -1.0
    gazes[:] = out
    return gazes
