from .optim import build_optimizer
from .bc import BCModels, init_bc_state, make_bc_train_step, make_bc_policy_fn
from .gaze_predictor import init_gaze_state, make_gaze_train_step
from .loop import Trainer

__all__ = [
    "build_optimizer",
    "BCModels",
    "init_bc_state",
    "make_bc_train_step",
    "make_bc_policy_fn",
    "init_gaze_state",
    "make_gaze_train_step",
    "Trainer",
]
