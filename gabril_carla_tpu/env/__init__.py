from .state import SceneState, EgoState, ActorPool, WalkerPool, ScenarioState, Criteria
from .world import WorldSpec, SCENARIO_TYPES
from .env import DrivingEnv

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
]
