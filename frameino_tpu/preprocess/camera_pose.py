"""Step 5: camera-pose pruning (reference
``preprocess/track_camera_pose_spatracker2.py`` + ``make_delete_lists_
camera.py``). The 3D tracker (SpaTrackV2/VGGT) is pluggable; the
pose-error pruning math is implemented: clips whose camera is static (no
parallax signal) or too shaky get dropped."""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np


def pose_translation_stats(poses: np.ndarray) -> Tuple[float, float]:
    """poses: [T, 4, 4] camera-to-world. Returns (total_path_length,
    max_per_frame_jerk)."""
    t = np.asarray(poses, np.float64)[:, :3, 3]
    step = np.linalg.norm(np.diff(t, axis=0), axis=-1)
    jerk = np.abs(np.diff(step)) if len(step) > 1 else np.zeros(1)
    return float(step.sum()), float(jerk.max(initial=0.0))


def prune_by_pose_error(poses: np.ndarray, min_path: float = 0.0,
                        max_path: float = np.inf,
                        max_jerk: float = np.inf) -> bool:
    """True if the clip should be KEPT."""
    path, jerk = pose_translation_stats(poses)
    return (min_path <= path <= max_path) and jerk <= max_jerk


def estimate_camera_homographies(frames: np.ndarray,
                                 grid: int = 12) -> np.ndarray:
    """Per-frame-pair RANSAC homographies from pyramidal-LK flow of a
    regular point grid — a real camera-motion estimator standing in for
    the SpaTrackV2/VGGT 3D tracker (reference
    ``track_camera_pose_spatracker2.py:231``; weights not shippable).
    Returns [T-1, 3, 3] homographies mapping frame t -> t+1.
    """
    import cv2
    from frameino_tpu.preprocess.lk_tracker import _LK_PARAMS
    H, W = frames.shape[1:3]
    ys, xs = np.meshgrid(np.linspace(H * 0.1, H * 0.9, grid),
                         np.linspace(W * 0.1, W * 0.9, grid),
                         indexing="ij")
    pts0 = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    gray = [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames]
    out = []
    for t in range(len(gray) - 1):
        p0 = pts0.reshape(-1, 1, 2)
        p1, st, _ = cv2.calcOpticalFlowPyrLK(gray[t], gray[t + 1], p0,
                                             None, **_LK_PARAMS)
        ok = st.reshape(-1).astype(bool)
        if ok.sum() < 8:
            out.append(np.eye(3))
            continue
        Hm, _ = cv2.findHomography(p0[ok], p1[ok], cv2.RANSAC, 3.0)
        out.append(Hm if Hm is not None else np.eye(3))
    return np.asarray(out, np.float64)


def camera_motion_stats(frames: np.ndarray) -> dict:
    """Summary stats driving the static/shaky pruning (counterpart of
    ``make_delete_lists_camera.py`` compute_pose_error): per-frame
    camera translation magnitude (homography translation component in
    pixels) and its jerk."""
    homs = estimate_camera_homographies(frames)
    trans = np.linalg.norm(homs[:, :2, 2], axis=-1)
    jerk = np.abs(np.diff(trans)) if len(trans) > 1 else np.zeros(1)
    return {"path_px": float(trans.sum()),
            "mean_step_px": float(trans.mean()),
            "max_jerk_px": float(jerk.max(initial=0.0))}


def keep_by_camera_motion(frames: np.ndarray,
                          max_mean_step_px: float = 15.0,
                          max_jerk_px: float = 20.0) -> bool:
    """KEEP unless the camera is too shaky (large jerk) or the whole
    frame moves so fast that object motion can't be separated."""
    s = camera_motion_stats(frames)
    return (s["mean_step_px"] <= max_mean_step_px
            and s["max_jerk_px"] <= max_jerk_px)
