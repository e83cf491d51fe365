from .state import SceneState, EgoState, ActorPool, WalkerPool, ScenarioState, Criteria
from .world import WorldSpec, SCENARIO_TYPES
from .env import DrivingEnv
from .xosc import load_xosc

__all__ = [
    "SceneState",
    "EgoState",
    "ActorPool",
    "WalkerPool",
    "ScenarioState",
    "Criteria",
    "WorldSpec",
    "SCENARIO_TYPES",
    "DrivingEnv",
    "load_xosc",
]
