"""mp4 export (autonomous_agent.py:118-132 video-dump parity)."""

import numpy as np

from gabril_carla_tpu.eval.video import write_mp4


def test_write_mp4_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.random((24, 180, 320)).astype(np.float32)
    path = write_mp4(frames, tmp_path / "clip.mp4", fps=20.0)
    assert path.exists() and path.stat().st_size > 1000

    import cv2

    cap = cv2.VideoCapture(str(path))
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    assert (n, w, h) == (24, 320, 180)


def test_write_mp4_uint8_rgb(tmp_path):
    frames = np.zeros((5, 64, 64, 3), np.uint8)
    frames[:, 10:20, 10:20] = 255
    path = write_mp4(frames, tmp_path / "rgb.mp4")
    assert path.exists() and path.stat().st_size > 100
