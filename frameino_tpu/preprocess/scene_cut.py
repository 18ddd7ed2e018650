"""Step 2: shot-boundary scoring + valid-duration pruning.

Reference ``preprocess/scoring_scene_cut_autoshot.py`` scores every
frame with AutoShot (TransNetV2 supernet) and
``make_delete_lists_scene_cut.py`` converts the scores into a per-clip
``valid_duration`` (the longest cut-free span). The scorer here is
pluggable: pass an AutoShot-like callable for parity, or use the
built-in frame-difference baseline.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np


def frame_difference_scores(frames: np.ndarray) -> np.ndarray:
    """[F, H, W, 3] -> [F] cut scores in [0, 1] (cheap baseline):
    normalized mean absolute inter-frame difference."""
    f = frames.astype(np.float32)
    d = np.abs(np.diff(f, axis=0)).mean(axis=(1, 2, 3))
    d = d / (d.max() + 1e-6)
    return np.concatenate([[0.0], d])


def score_scene_cuts(frames: np.ndarray,
                     model: Optional[Callable] = None) -> np.ndarray:
    scorer = model or frame_difference_scores
    return np.asarray(scorer(frames))


def longest_clean_span(scores: np.ndarray,
                       threshold: float = 0.5) -> Tuple[int, int]:
    """Longest [start, end) span with no score >= threshold — the
    ``valid_duration`` the dataset consumes."""
    cuts = [0] + [i for i, s in enumerate(scores) if s >= threshold] \
        + [len(scores)]
    best = (0, 0)
    for a, b in zip(cuts[:-1], cuts[1:]):
        start = a if a == 0 else a + 0      # span starts at the cut frame
        if b - start > best[1] - best[0]:
            best = (start, b)
    return best
