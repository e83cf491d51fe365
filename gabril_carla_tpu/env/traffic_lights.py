"""Traffic-light state machine, derived (not stored) state.

Replaces the CARLA server's traffic-light actors + srunner's annotation/
freeze machinery (carla_data_provider.py:317-455, TrafficLightFreezer at
atomic_behaviors.py:3453). Light color is a pure function of sim time —
phase(t) = (t + offset) mod cycle over (green, yellow, red) windows — so a
vmapped world carries no light state at all; a freeze is expressed as a
cycle with one huge window (e.g. CrossingBicycleFlow's red-for-5s-then-
green contract, cross_bicycle_flow.py:82,167-172, is red_s=5, green_s=1e6,
offset=green_s).

WorldSpec carries per-light stop-line arclengths, phase offsets, and cycle
windows (world.build_world_spec places them at the flow crossing and at
curvature-detected junctions); the red-light criterion and the expert both
derive light color from the same function.
"""

from __future__ import annotations

import jax.numpy as jnp

GREEN, YELLOW, RED = 0, 1, 2


def light_state(t_seconds, offset, green_s=10.0, yellow_s=3.0, red_s=12.0):
    """Color index for one light (broadcasts over arrays of offsets/windows)."""
    cycle = green_s + yellow_s + red_s
    phase = jnp.mod(t_seconds + offset, cycle)
    return jnp.where(phase < green_s, GREEN, jnp.where(phase < green_s + yellow_s, YELLOW, RED))


def red_light_crossing(tl_stop_s, tl_offset, n_tl, prev_route_idx, new_route_idx, t_seconds,
                       green_s=10.0, yellow_s=3.0, red_s=12.0):
    """True if the ego crossed any stop line this tick while its light is red.

    RunningRedLightTest semantics (atomic_criteria.py:1620): the infraction
    registers at the moment the vehicle enters the junction on red. The
    window durations broadcast per light (arrays from WorldSpec).
    """
    k = tl_stop_s.shape[0]
    active = jnp.arange(k) < n_tl
    s0 = prev_route_idx.astype(jnp.float32)
    s1 = new_route_idx.astype(jnp.float32)
    crossed = (s0 < tl_stop_s) & (s1 >= tl_stop_s)
    is_red = light_state(t_seconds, tl_offset, green_s, yellow_s, red_s) == RED
    return jnp.any(active & crossed & is_red)
