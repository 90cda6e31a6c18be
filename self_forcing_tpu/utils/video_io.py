"""Video/image IO helpers (reference wan/utils/utils.py cache_video /
cache_image, inference.py:196 imageio.mimwrite).

cv2's VideoWriter handles mp4 without the ffmpeg plugin imageio lacks in
this image; imageio remains the fallback (and handles gif)."""
from __future__ import annotations

import os

import numpy as np


def save_video(frames: np.ndarray, path: str, fps: int = 16) -> str:
    """frames: [T, H, W, 3] uint8 RGB."""
    frames = np.asarray(frames)
    assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".gif"):
        import imageio
        imageio.mimwrite(path, list(frames), fps=fps)
        return path
    try:
        import cv2
        h, w = frames.shape[1:3]
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        vw = cv2.VideoWriter(path, fourcc, fps, (w, h))
        assert vw.isOpened(), "cv2 VideoWriter failed to open"
        for f in frames:
            vw.write(f[..., ::-1])  # RGB -> BGR
        vw.release()
    except (ImportError, AssertionError):
        import imageio
        imageio.mimwrite(path, list(frames), fps=fps, quality=8)
    return path


def save_image(image: np.ndarray, path: str) -> str:
    """image: [H, W, 3] uint8 RGB (cache_image, wan/utils/utils.py)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from PIL import Image
    Image.fromarray(image).save(path)
    return path


def load_video(path: str, max_frames: int | None = None) -> np.ndarray:
    """-> [T, H, W, 3] uint8 RGB."""
    import cv2
    cap = cv2.VideoCapture(path)
    assert cap.isOpened(), f"could not open {path}"
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames and len(frames) >= max_frames):
            break
        frames.append(frame[..., ::-1])
    cap.release()
    return np.stack(frames)
