from .rollout import make_rollout_fn, rollout_routes
from .stats import route_record, aggregate_scores, write_stats_json

__all__ = [
    "make_rollout_fn",
    "rollout_routes",
    "route_record",
    "aggregate_scores",
    "write_stats_json",
]
