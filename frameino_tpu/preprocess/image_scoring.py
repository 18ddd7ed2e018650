"""Step 3: image quality scoring (reference ``preprocess/scoring_img.py``).

The reference scores IQA (pyiqa), image complexity (ICNet), text area,
aesthetics, and first-frame clarity. Those models are pluggable here;
the built-in baselines cover clarity (Laplacian variance), brightness,
and contrast so the pruning pipeline runs offline.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import cv2
import numpy as np


def clarity_score(image: np.ndarray) -> float:
    """Laplacian variance — standard sharpness proxy."""
    gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
    return float(cv2.Laplacian(gray, cv2.CV_64F).var())


def brightness_score(image: np.ndarray) -> float:
    return float(image.mean() / 255.0)


def contrast_score(image: np.ndarray) -> float:
    return float(image.std() / 255.0)


def score_images(first_frame: np.ndarray,
                 extra_scorers: Optional[Dict[str, Callable]] = None
                 ) -> Dict[str, float]:
    scores = {
        "clarity": clarity_score(first_frame),
        "brightness": brightness_score(first_frame),
        "contrast": contrast_score(first_frame),
    }
    for name, fn in (extra_scorers or {}).items():
        scores[name] = float(fn(first_frame))
    return scores


def prune_by_scores(rows_scores, min_clarity: float = 20.0,
                    brightness_range=(0.08, 0.95)):
    kept, rejected = [], []
    for row, s in rows_scores:
        ok = (s["clarity"] >= min_clarity and
              brightness_range[0] <= s["brightness"] <= brightness_range[1])
        (kept if ok else rejected).append(row)
    return kept, rejected
