from .image import (
    bicubic_resize_matrix,
    resize_bicubic,
    rgb_to_grayscale,
    stack_window_indices,
    format_obs_stack,
)
from .gaze import gaze_mask_from_latent, gmd_dropout
from .heatmap import GazeHeatmapper

__all__ = [
    "bicubic_resize_matrix",
    "resize_bicubic",
    "rgb_to_grayscale",
    "stack_window_indices",
    "format_obs_stack",
    "gaze_mask_from_latent",
    "gmd_dropout",
    "GazeHeatmapper",
]
