"""OpenSCENARIO ingestion: env/xosc.py against synthetic + reference files."""

import math
from pathlib import Path

import numpy as np
import pytest

from gabril_carla_tpu.env.world import SCENARIO_TYPES, build_world_spec
from gabril_carla_tpu.env.xosc import load_xosc

from gabril_carla_tpu.data.vendored import xosc_example

REF_EXAMPLES = xosc_example("CyclistCrossing.xosc").parent  # vendored, reference fallback

SYNTH = """<?xml version="1.0"?>
<OpenSCENARIO>
  <FileHeader revMajor="1" revMinor="0" description="CARLA:SynthCrossing" author=""/>
  <ParameterDeclarations>
    <ParameterDeclaration name="walkSpeed" parameterType="double" value="2.5"/>
  </ParameterDeclarations>
  <RoadNetwork><LogicFile filepath="Town07"/></RoadNetwork>
  <Entities>
    <ScenarioObject name="hero">
      <Vehicle name="vehicle.lincoln.mkz_2020" vehicleCategory="car"/>
    </ScenarioObject>
    <ScenarioObject name="adversary">
      <Pedestrian model="walker.pedestrian.0001" mass="90" name="w" pedestrianCategory="pedestrian"/>
    </ScenarioObject>
  </Entities>
  <Storyboard>
    <Init>
      <Actions>
        <GlobalAction>
          <EnvironmentAction>
            <Environment name="E">
              <Weather cloudState="overcast">
                <Sun intensity="0.85" azimuth="0" elevation="0.5235987755982988"/>
                <Fog visualRange="150.0"/>
                <Precipitation precipitationType="rain" intensity="0.4"/>
              </Weather>
            </Environment>
          </EnvironmentAction>
        </GlobalAction>
        <Private entityRef="hero">
          <PrivateAction><TeleportAction><Position>
            <WorldPosition x="10" y="20" z="0" h="0.0"/>
          </Position></TeleportAction></PrivateAction>
        </Private>
        <Private entityRef="adversary">
          <PrivateAction><TeleportAction><Position>
            <RelativeWorldPosition entityRef="hero" dx="60" dy="-4"/>
          </Position></TeleportAction></PrivateAction>
        </Private>
      </Actions>
    </Init>
    <Story name="S"><Act name="A"><ManeuverGroup name="M" maximumExecutionCount="1">
      <Actors selectTriggeringEntities="false"><EntityRef entityRef="adversary"/></Actors>
      <Maneuver name="Cross">
        <Event name="Walk" priority="overwrite">
          <Action name="Walk"><PrivateAction><LongitudinalAction><SpeedAction>
            <SpeedActionDynamics dynamicsShape="step" value="1" dynamicsDimension="time"/>
            <SpeedActionTarget><AbsoluteTargetSpeed value="$walkSpeed"/></SpeedActionTarget>
          </SpeedAction></LongitudinalAction></PrivateAction></Action>
          <StartTrigger><ConditionGroup>
            <Condition name="Near" delay="0" conditionEdge="rising">
              <ByEntityCondition>
                <TriggeringEntities triggeringEntitiesRule="any"><EntityRef entityRef="hero"/></TriggeringEntities>
                <EntityCondition><RelativeDistanceCondition entityRef="adversary"
                  relativeDistanceType="cartesianDistance" value="18.0" freespace="false" rule="lessThan"/></EntityCondition>
              </ByEntityCondition>
            </Condition>
          </ConditionGroup></StartTrigger>
        </Event>
      </Maneuver>
    </ManeuverGroup></Act></Story>
  </Storyboard>
</OpenSCENARIO>
"""


@pytest.fixture()
def synth_path(tmp_path):
    p = tmp_path / "SynthCrossing.xosc"
    p.write_text(SYNTH)
    return p


def test_synthetic_parse(synth_path):
    route = load_xosc(synth_path)
    assert route["town"] == "Town07"
    assert route["name"] == "SynthCrossing"
    # straight route east from (10, 20)
    wps = route["waypoints"]
    assert np.allclose(wps[0], [10, 20]) and wps[-1][0] > 140
    assert np.allclose(wps[:, 1], 20)
    # pedestrian adversary at hero+60 -> PedestrianCrossing armed 18 m before
    (rec,) = route["scenarios"]
    assert rec["type"] == "PedestrianCrossing"
    assert rec["distance"] == pytest.approx(18.0)
    assert rec["trigger"][0] == pytest.approx(10 + 60 - 18)
    assert rec["speed"] == pytest.approx(2.5)  # $walkSpeed substituted
    # weather: overcast / rain 40% / fog from 150 m range / sun 30 deg
    cloud, rain, fog, sun = route["weather"]
    assert cloud == 85.0 and rain == pytest.approx(40.0)
    assert fog == pytest.approx((1 - 150 / 300) * 100)
    assert sun == pytest.approx(30.0)


def test_synthetic_compiles_and_runs(synth_path):
    import jax
    import jax.numpy as jnp

    from gabril_carla_tpu.env.env import DrivingEnv

    route = load_xosc(synth_path)
    spec = build_world_spec(route, ambient=False)
    assert SCENARIO_TYPES[route["scenarios"][0]["type"]] == 6
    spec = jax.tree.map(jnp.asarray, spec)
    env = DrivingEnv()
    state = env.reset(spec, jax.random.PRNGKey(0))

    def body(st, _):
        st = env.step(spec, st, jnp.zeros(7), jax.random.PRNGKey(1))
        return st, st.ego.pos[0]

    state, xs = jax.lax.scan(body, state, None, length=40)
    assert np.isfinite(np.asarray(xs)).all()
    # crossing walkers are compiled in near the adversary's arclength
    wb, wn = np.asarray(spec.scen_walk_base), np.asarray(spec.scen_walk_n)
    assert int(wb[-1] + wn[-1]) == 3


def test_lane_position_gated(tmp_path):
    bad = SYNTH.replace(
        '<WorldPosition x="10" y="20" z="0" h="0.0"/>',
        '<LanePosition roadId="4" laneId="-1" offset="1.0" s="48.58"/>')
    p = tmp_path / "bad.xosc"
    p.write_text(bad)
    with pytest.raises(ValueError, match="LanePosition"):
        load_xosc(p)


@pytest.mark.skipif(not REF_EXAMPLES.exists(), reason="reference checkout absent")
def test_reference_examples_world_positions():
    for name, expected in [("CyclistCrossing", "DynamicObjectCrossing"),
                           ("PedestrianCrossingFront", "PedestrianCrossing")]:
        route = load_xosc(REF_EXAMPLES / f"{name}.xosc")
        (rec,) = route["scenarios"]
        assert rec["type"] == expected, name
        spec = build_world_spec(route, ambient=False)
        assert float(np.asarray(spec.route_len)) > 50.0


@pytest.mark.skipif(not REF_EXAMPLES.exists(), reason="reference checkout absent")
def test_reference_road_position_gated():
    # FollowLeadingVehicle places the hero by RoadPosition (needs OpenDRIVE)
    with pytest.raises(ValueError, match="RoadPosition"):
        load_xosc(REF_EXAMPLES / "FollowLeadingVehicle.xosc")


def test_multi_adversary_storyboard(tmp_path):
    """Two adversaries -> two scenario records, events scoped per entity."""
    doc = SYNTH.replace(
        '<ScenarioObject name="adversary">',
        '<ScenarioObject name="lead">\n'
        '      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car"/>\n'
        '    </ScenarioObject>\n'
        '    <ScenarioObject name="adversary">',
    ).replace(
        '<Private entityRef="adversary">',
        '<Private entityRef="lead">\n'
        '          <PrivateAction><TeleportAction><Position>\n'
        '            <RelativeWorldPosition entityRef="hero" dx="100" dy="0"/>\n'
        '          </Position></TeleportAction></PrivateAction>\n'
        '        </Private>\n'
        '        <Private entityRef="adversary">',
    ).replace(
        "</ManeuverGroup></Act></Story>",
        '</ManeuverGroup>\n'
        '    <ManeuverGroup name="M2" maximumExecutionCount="1">\n'
        '      <Actors selectTriggeringEntities="false"><EntityRef entityRef="lead"/></Actors>\n'
        '      <Maneuver name="Drive">\n'
        '        <Event name="Go" priority="overwrite">\n'
        '          <Action name="Go"><PrivateAction><LongitudinalAction><SpeedAction>\n'
        '            <SpeedActionDynamics dynamicsShape="step" value="1" dynamicsDimension="time"/>\n'
        '            <SpeedActionTarget><AbsoluteTargetSpeed value="7.5"/></SpeedActionTarget>\n'
        '          </SpeedAction></LongitudinalAction></PrivateAction></Action>\n'
        '          <StartTrigger><ConditionGroup>\n'
        '            <Condition name="Near2" delay="0" conditionEdge="rising">\n'
        '              <ByEntityCondition>\n'
        '                <TriggeringEntities triggeringEntitiesRule="any"><EntityRef entityRef="hero"/></TriggeringEntities>\n'
        '                <EntityCondition><RelativeDistanceCondition entityRef="lead"\n'
        '                  relativeDistanceType="cartesianDistance" value="30.0" freespace="false" rule="lessThan"/></EntityCondition>\n'
        '              </ByEntityCondition>\n'
        '            </Condition>\n'
        '          </ConditionGroup></StartTrigger>\n'
        '        </Event>\n'
        '      </Maneuver>\n'
        '    </ManeuverGroup></Act></Story>',
    )
    p = tmp_path / "TwoAdversaries.xosc"
    p.write_text(doc)
    route = load_xosc(p)
    recs = route["scenarios"]
    assert len(recs) == 2
    by_type = {r["type"]: r for r in recs}
    assert by_type["PedestrianCrossing"]["speed"] == pytest.approx(2.5)
    assert by_type["PedestrianCrossing"]["distance"] == pytest.approx(18.0)
    assert by_type["HardBreakRoute"]["speed"] == pytest.approx(7.5)
    assert by_type["HardBreakRoute"]["distance"] == pytest.approx(30.0)
    spec = build_world_spec(route, ambient=False)
    assert spec.scenario_type.shape == (2,)
    stypes = np.asarray(spec.scenario_type).tolist()
    assert sorted(stypes) == [6, 12]
    # the declared SpeedActions reach the compiled world: the lead cruises
    # at its storyboard speed (scen_aux[k,1]), the walkers at theirs
    k_lead = stypes.index(12)
    assert float(spec.scen_aux[k_lead, 1]) == pytest.approx(7.5)
    k_ped = stypes.index(6)
    wb, wn = int(spec.scen_walk_base[k_ped]), int(spec.scen_walk_n[k_ped])
    wspeeds = np.linalg.norm(np.asarray(spec.walk_vel)[wb:wb + wn], axis=1)
    assert wspeeds.min() == pytest.approx(2.5, abs=1e-5)


def test_trigger_condition_entityref_does_not_claim_group(tmp_path):
    """A group whose StartTrigger *references* the pedestrian (drive off when
    the ped is near) is NOT the pedestrian's maneuver: only the Actors block
    scopes attribution. Placed before the ped's own group to expose
    document-order capture."""
    doc = SYNTH.replace(
        '<ScenarioObject name="adversary">',
        '<ScenarioObject name="lead">\n'
        '      <Vehicle name="vehicle.tesla.model3" vehicleCategory="car"/>\n'
        '    </ScenarioObject>\n'
        '    <ScenarioObject name="adversary">',
    ).replace(
        '<Private entityRef="adversary">',
        '<Private entityRef="lead">\n'
        '          <PrivateAction><TeleportAction><Position>\n'
        '            <RelativeWorldPosition entityRef="hero" dx="100" dy="0"/>\n'
        '          </Position></TeleportAction></PrivateAction>\n'
        '        </Private>\n'
        '        <Private entityRef="adversary">',
    ).replace(
        '<Act name="A"><ManeuverGroup name="M" maximumExecutionCount="1">',
        '<Act name="A"><ManeuverGroup name="M2" maximumExecutionCount="1">\n'
        '      <Actors selectTriggeringEntities="false"><EntityRef entityRef="lead"/></Actors>\n'
        '      <Maneuver name="Drive">\n'
        '        <Event name="Go" priority="overwrite">\n'
        '          <Action name="Go"><PrivateAction><LongitudinalAction><SpeedAction>\n'
        '            <SpeedActionDynamics dynamicsShape="step" value="1" dynamicsDimension="time"/>\n'
        '            <SpeedActionTarget><AbsoluteTargetSpeed value="9.0"/></SpeedActionTarget>\n'
        '          </SpeedAction></LongitudinalAction></PrivateAction></Action>\n'
        '          <StartTrigger><ConditionGroup>\n'
        '            <Condition name="PedNear" delay="0" conditionEdge="rising">\n'
        '              <ByEntityCondition>\n'
        '                <TriggeringEntities triggeringEntitiesRule="any"><EntityRef entityRef="hero"/></TriggeringEntities>\n'
        '                <EntityCondition><RelativeDistanceCondition entityRef="adversary"\n'
        '                  relativeDistanceType="cartesianDistance" value="25.0" freespace="false" rule="lessThan"/></EntityCondition>\n'
        '              </ByEntityCondition>\n'
        '            </Condition>\n'
        '          </ConditionGroup></StartTrigger>\n'
        '        </Event>\n'
        '      </Maneuver>\n'
        '    </ManeuverGroup><ManeuverGroup name="M" maximumExecutionCount="1">',
    )
    p = tmp_path / "TriggerRefCapture.xosc"
    p.write_text(doc)
    recs = {r["type"]: r for r in load_xosc(p)["scenarios"]}
    # the ped keeps ITS event (walkSpeed/18 m), not the lead's (9.0/25 m)
    assert recs["PedestrianCrossing"]["speed"] == pytest.approx(2.5)
    assert recs["PedestrianCrossing"]["distance"] == pytest.approx(18.0)
    assert recs["HardBreakRoute"]["speed"] == pytest.approx(9.0)
    assert recs["HardBreakRoute"]["distance"] == pytest.approx(25.0)


def test_init_only_vehicle_is_parked_prop(tmp_path):
    """An entity with only an Init teleport (no ManeuverGroup of its own)
    must not inherit another entity's maneuver: it compiles to a static
    ParkedObstacle record with no speed."""
    doc = SYNTH.replace(
        '<ScenarioObject name="adversary">',
        '<ScenarioObject name="prop">\n'
        '      <Vehicle name="vehicle.nissan.patrol" vehicleCategory="car"/>\n'
        '    </ScenarioObject>\n'
        '    <ScenarioObject name="adversary">',
    ).replace(
        '<Private entityRef="adversary">',
        '<Private entityRef="prop">\n'
        '          <PrivateAction><TeleportAction><Position>\n'
        '            <RelativeWorldPosition entityRef="hero" dx="80" dy="0"/>\n'
        '          </Position></TeleportAction></PrivateAction>\n'
        '        </Private>\n'
        '        <Private entityRef="adversary">',
    )
    p = tmp_path / "StaticProp.xosc"
    p.write_text(doc)
    route = load_xosc(p)
    recs = {r["type"]: r for r in route["scenarios"]}
    assert recs["PedestrianCrossing"]["speed"] == pytest.approx(2.5)
    assert "ParkedObstacle" in recs, recs
    assert "speed" not in recs["ParkedObstacle"]
    spec = build_world_spec(route, ambient=False)
    assert spec.scenario_type.shape == (2,)
