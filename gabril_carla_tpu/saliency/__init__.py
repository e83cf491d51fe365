from .pseudo_gaze import (
    bboxes_to_gaze_coords,
    SceneGraphDetector,
    ExternalVLMDetector,
    generate_pseudo_gaze,
)

__all__ = [
    "bboxes_to_gaze_coords",
    "SceneGraphDetector",
    "ExternalVLMDetector",
    "generate_pseudo_gaze",
]
