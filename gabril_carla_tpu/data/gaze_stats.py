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
