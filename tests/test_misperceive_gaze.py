"""Semantic gaze-error model (gaze_stats.misperceive_gaze_coords).

Behavioral contract of the ladder's 4th rung: the output stream carries the
eye-tracker statistics of humanize_gaze_coords (one held fixation in cols
0:2, dropout frames) but the fixated TARGET is sometimes semantically wrong
— attention lapses park on the road point, wrong-actor fixations select a
non-top hazard biased toward actors near the true one. Probabilities are
pinned by driving each branch to 0/1.
"""

import numpy as np

from gabril_carla_tpu.data.gaze_stats import misperceive_gaze_coords

# synthetic analytic gaze: point 0 = road (0.5, 0.8), point 1 = top hazard
# (0.2, 0.4), point 2 = near-hazard actor (0.25, 0.42), point 3 = far actor
# (0.9, 0.1)
ROAD = (0.5, 0.8)
TOP = (0.2, 0.4)
NEAR = (0.25, 0.42)
FAR = (0.9, 0.1)


def _dense(t=400):
    g = np.tile(np.asarray(ROAD + TOP + NEAR + FAR, np.float32), (t, 1))
    return g


def _closest(rows, targets):
    """Index of the closest target for each valid output row."""
    d = np.linalg.norm(rows[:, None, :] - np.asarray(targets)[None], axis=-1)
    return d.argmin(axis=1)


def test_output_layout_and_dropout():
    g = misperceive_gaze_coords(_dense(), blank_frac=0.35, seed=7)
    assert (g[:, 2:] == -1.0).all()  # one fixation in cols 0:2 only
    valid = (g[:, 0] >= 0)
    assert 0.5 < valid.mean() < 0.8  # ~65% survive dropout


def test_no_error_branches_track_top_hazard():
    g = misperceive_gaze_coords(_dense(), p_lapse=0.0, p_wrong=0.0,
                                blank_frac=0.0, seed=7)
    rows = g[g[:, 0] >= 0, 0:2]
    who = _closest(rows, [ROAD, TOP, NEAR, FAR])
    assert (who == 1).mean() > 0.95  # essentially always the top hazard


def test_lapse_parks_on_road():
    g = misperceive_gaze_coords(_dense(), p_lapse=1.0, p_wrong=0.0,
                                blank_frac=0.0, seed=7)
    rows = g[g[:, 0] >= 0, 0:2]
    who = _closest(rows, [ROAD, TOP, NEAR, FAR])
    assert (who == 0).all()


def test_wrong_actor_is_distance_biased():
    g = misperceive_gaze_coords(_dense(4000), p_lapse=0.0, p_wrong=1.0,
                                blank_frac=0.0, seed=7)
    rows = g[g[:, 0] >= 0, 0:2]
    who = _closest(rows, [ROAD, TOP, NEAR, FAR])
    # every fixation TARGETS a non-top actor; landing noise (sigma 0.015)
    # can misattribute a NEAR-targeted sample to TOP (0.05 apart), so allow
    # a small classification slack. The near actor (crowding) dominates the
    # far one: exp(-d/sigma) with d_near ~ 0.05, d_far ~ 0.75
    assert (who != 1).mean() > 0.9
    n_near, n_far = (who == 2).sum(), (who == 3).sum()
    assert n_near > 10 * max(n_far, 1)


def test_fixations_hold_between_saccades():
    g = misperceive_gaze_coords(_dense(), p_lapse=0.0, p_wrong=0.0,
                                blank_frac=0.0, seed=7)
    rows = g[:, 0:2]
    # piecewise-constant-with-drift: consecutive-frame displacement is tiny
    # within fixations (drift sigma 0.004) for most frame pairs
    step = np.linalg.norm(np.diff(rows, axis=0), axis=1)
    assert np.median(step) < 0.02


def test_fixations_respect_episode_boundaries():
    t = 60
    g = _dense(2 * t)
    # make the two episodes' hazards distinguishable
    g[t:, 2:4] = (0.7, 0.6)
    lengths = np.asarray([t, t])
    out = misperceive_gaze_coords(g, lengths=lengths, p_lapse=0.0,
                                  p_wrong=0.0, blank_frac=0.0, seed=7)
    a = out[:t, 0:2]
    b = out[t:, 0:2]
    # episode 2's very first frames already fixate episode 2's hazard — no
    # fixation carried across the boundary
    assert np.linalg.norm(b[0] - (0.7, 0.6)) < 0.08
    assert np.linalg.norm(a[-1] - TOP) < 0.08


def test_falls_back_to_road_when_no_actor():
    g = _dense()
    g[:, 2:] = -1.0  # no valid actors anywhere
    out = misperceive_gaze_coords(g, p_lapse=0.0, p_wrong=0.0,
                                  blank_frac=0.0, seed=7)
    rows = out[out[:, 0] >= 0, 0:2]
    assert len(rows) and (np.linalg.norm(rows - ROAD, axis=1) < 0.08).all()
