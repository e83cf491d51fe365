from .dataset import BCDataset, EpisodeStore, synthetic_episodes
from .tasks import TASK_TO_ROUTE, MAX_EPISODES, seen_routes, unseen_routes

__all__ = [
    "BCDataset",
    "EpisodeStore",
    "synthetic_episodes",
    "TASK_TO_ROUTE",
    "MAX_EPISODES",
    "seen_routes",
    "unseen_routes",
]
