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
