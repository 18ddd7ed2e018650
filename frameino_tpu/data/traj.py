"""Trajectory rasterization — numpy parity with the reference.

Reference ``data_loader/video_dataset_motion_FrameINO.py:126-213``
(``prepare_traj_tensor``): per frame, colored squares are painted at
each tracked point on a white canvas at the ORIGINAL resolution (dot
radius scaled by height/384), resized to the target resolution with
cubic interpolation, then dilated with a 45x45 isotropic bivariate
Gaussian (sigma 3). The [-1, 1] tensor feeds the VAE; the raw uint8
frames feed validation visualizations. Also the demo's arc-length
trajectory resampler (reference ``app.py:487-501``).
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from frameino_tpu.utils.optical_flow import bivariate_gaussian

# Fixed palette (reference :33-37): 9 deterministic colors then random.
ALL_COLOR_CODES: List[Tuple[int, int, int]] = [
    (255, 0, 0), (255, 255, 0), (0, 255, 0), (0, 255, 255),
    (255, 0, 255), (0, 0, 255), (128, 128, 128), (64, 224, 208),
    (233, 150, 122),
]
_rng = random.Random(1234)
for _ in range(100):
    ALL_COLOR_CODES.append((_rng.randint(0, 255), _rng.randint(0, 255),
                            _rng.randint(0, 255)))

_BLUR_KERNEL = bivariate_gaussian(45, 3, 3, 0, isotropic=True)


def rasterize_trajectories(full_pred_tracks: Sequence[Sequence[Sequence]],
                           original_height: int, original_width: int,
                           dot_radius: int,
                           target_width: int, target_height: int,
                           selected_frames: Optional[np.ndarray] = None,
                           region_box=None):
    """tracks[frame][object][point] = (x, y) -> rasterized video.

    Returns (traj_float [-1,1] np.float32 [F,3,H,W], traj_uint8
    [F,H,W,3], merge_frames or None).
    """
    colors = ALL_COLOR_CODES[:len(full_pred_tracks[0])]
    radius = int(dot_radius * original_height / 384)

    traj_frames = []
    merge_frames = [] if selected_frames is not None else None
    for t, obj_points in enumerate(full_pred_tracks):
        canvas = np.full((original_height, original_width, 3), 255.0,
                         np.float32)
        for obj_idx, points in enumerate(obj_points):
            color = colors[obj_idx]
            for (x, y) in points:
                if x < 0 or x >= original_width or y < 0 or \
                        y >= original_height:
                    continue
                y0 = min(original_height, max(0, int(y) - radius))
                y1 = min(original_height, max(0, int(y) + radius))
                x0 = min(original_width, max(0, int(x) - radius))
                x1 = min(original_width, max(0, int(x) + radius))
                canvas[y0:y1, x0:x1] = color
        canvas = cv2.resize(canvas, (target_width, target_height),
                            interpolation=cv2.INTER_CUBIC)
        canvas = cv2.filter2D(canvas, -1, _BLUR_KERNEL).astype(np.uint8)
        traj_frames.append(canvas)

        if merge_frames is not None:
            frame = selected_frames[t].copy()
            if region_box is not None:
                (tx, ty), (bx, by) = region_box
                frame = cv2.rectangle(frame, (tx, ty), (bx, by),
                                      (255, 0, 0), 5)
            frame[canvas < 250] = canvas[canvas < 250]
            merge_frames.append(frame)

    traj_uint8 = np.stack(traj_frames)
    traj_float = traj_uint8.astype(np.float32) / 255.0 * 2.0 - 1.0
    traj_float = traj_float.transpose(0, 3, 1, 2)          # [F, C, H, W]
    merged = np.stack(merge_frames) if merge_frames is not None else None
    return traj_float, traj_uint8, merged


def resample_track_by_length(points: Sequence[Tuple[float, float]],
                             num_samples: int) -> np.ndarray:
    """Arc-length-uniform polyline resampling (reference app.py:487-501):
    clicked waypoints -> one point per output frame."""
    pts = np.asarray(points, np.float64)
    if len(pts) == 1:
        return np.repeat(pts, num_samples, axis=0)
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    if total == 0:
        return np.repeat(pts[:1], num_samples, axis=0)
    targets = np.linspace(0.0, total, num_samples)
    out = np.empty((num_samples, 2))
    out[:, 0] = np.interp(targets, cum, pts[:, 0])
    out[:, 1] = np.interp(targets, cum, pts[:, 1])
    return out
