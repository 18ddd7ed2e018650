"""Step 4: panoptic segmentation -> per-object sampled points.

Reference ``preprocess/filter_panoptic_multi.py`` + vendored OneFormer:
panoptic masks on sampled frames, then per-object point sampling that
becomes the ``Obj_Info`` / ``Panoptic_Segmentation`` CSV columns. The
panoptic model is pluggable (an OneFormer-equivalent would build on
``frameino_tpu/ops/ms_deform_attn``); the point-sampling and CSV logic
is fully implemented.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def sample_points_from_mask(mask: np.ndarray, num_points: int = 10,
                            rng: Optional[np.random.Generator] = None
                            ) -> List[Tuple[int, int]]:
    """Uniformly sample (x, y) points inside a binary object mask."""
    rng = rng or np.random.default_rng(0)
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return []
    idx = rng.choice(len(xs), size=min(num_points, len(xs)), replace=False)
    return [(int(xs[i]), int(ys[i])) for i in idx]


def run_panoptic_step(frames: np.ndarray,
                      panoptic_model: Callable,
                      frame_idx: int = 0,
                      num_points: int = 10,
                      min_area: int = 64,
                      rng: Optional[np.random.Generator] = None):
    """panoptic_model(frame) -> list of (label: str, mask: [H, W] bool).

    Returns (Obj_Info, Panoptic_Segmentation) column payloads in the
    reference's JSON-list-per-panoptic-choice format."""
    segments = panoptic_model(frames[frame_idx])
    obj_info, seg_points = [], []
    for label, mask in segments:
        if int(mask.sum()) < min_area:
            continue
        pts = sample_points_from_mask(mask, num_points, rng)
        if not pts:
            continue
        obj_info.append([label, frame_idx])
        seg_points.append(pts)
    return [obj_info], [seg_points]


def connected_component_panoptic(frame: np.ndarray,
                                 threshold: int = 128):
    """Cheap baseline 'panoptic' model: bright/dark connected components.
    Lets the pipeline run without OneFormer."""
    import cv2
    gray = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
    binary = (gray > threshold).astype(np.uint8)
    n, labels = cv2.connectedComponents(binary)
    out = []
    for i in range(1, n):
        out.append((f"region_{i}", labels == i))
    return out
