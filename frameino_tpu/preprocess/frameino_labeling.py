"""Step 8: FrameINO labeling — region boxes + ID reference crops.

Reference ``preprocess/track_FrameINO.py``: SAM2-refined object masks,
then region boxes are searched such that the ID object STARTS OUTSIDE
the box (the Frame-In premise, reference docstring ``:1-4``); the
largest N candidates become the ``ID_info`` CSV column together with
the cropped ID reference image path. The mask refiner is pluggable; the
box search and crop logic is implemented.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def object_bbox(mask: np.ndarray) -> Optional[Tuple[int, int, int, int]]:
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return None
    return int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1


def boxes_exclude_bbox(height: int, width: int,
                       obj_box: Tuple[int, int, int, int],
                       grid: int = 8, min_frac: float = 0.3
                       ) -> List[Tuple[int, Tuple[int, int], Tuple[int, int]]]:
    """Candidate region boxes that DON'T contain the object's first-frame
    bbox (so the object frames-in from outside). Returns
    [area, (tlx, tly), (brx, bry)] entries like ``ID_info``."""
    ox0, oy0, ox1, oy1 = obj_box
    xs = np.linspace(0, width, grid + 1).astype(int)
    ys = np.linspace(0, height, grid + 1).astype(int)
    out = []
    for i in range(grid):
        for j in range(i + 1, grid + 1):
            for k in range(grid):
                for l in range(k + 1, grid + 1):
                    tlx, brx = xs[i], xs[j]
                    tly, bry = ys[k], ys[l]
                    if (brx - tlx) < min_frac * width or \
                            (bry - tly) < min_frac * height:
                        continue
                    # object bbox must be fully outside the box
                    overlap_x = max(0, min(brx, ox1) - max(tlx, ox0))
                    overlap_y = max(0, min(bry, oy1) - max(tly, oy0))
                    if overlap_x > 0 and overlap_y > 0:
                        continue
                    out.append([(brx - tlx) * (bry - tly),
                                (tlx, tly), (brx, bry)])
    return out


def find_region_boxes(first_frame_mask: np.ndarray, keep_n: int = 5,
                      grid: int = 8, min_frac: float = 0.3):
    """Largest ``keep_n`` region boxes excluding the object's start bbox
    (reference keeps the <=N largest, ``track_FrameINO.py:679-682``)."""
    h, w = first_frame_mask.shape
    box = object_bbox(first_frame_mask)
    if box is None:
        return []
    candidates = boxes_exclude_bbox(h, w, box, grid, min_frac)
    candidates.sort(key=lambda x: x[0])
    return candidates[-keep_n:]


def crop_id_reference(frame: np.ndarray, mask: np.ndarray,
                      pad: int = 2) -> Optional[np.ndarray]:
    """Background-zeroed tight crop of the object (the ID reference
    image saved per object)."""
    box = object_bbox(mask)
    if box is None:
        return None
    x0, y0, x1, y1 = box
    h, w = mask.shape
    x0, y0 = max(0, x0 - pad), max(0, y0 - pad)
    x1, y1 = min(w, x1 + pad), min(h, y1 + pad)
    crop = frame[y0:y1, x0:x1] * (mask[y0:y1, x0:x1, None] > 0)
    return crop.astype(np.uint8)


def label_step(first_frame: np.ndarray, mask: np.ndarray,
               keep_n: int = 5, grid: int = 8, min_frac: float = 0.3):
    """Step-8 convenience: object mask on frame 0 -> (ID_info entry,
    ID crop image) or (None, None) when no valid region box exists.

    The entry is ``[segmentation_info, region_boxes]`` shaped like the
    dataset's ``ID_info`` column (segmentation_info =
    [bbox, <crop filename to be filled by the caller>, []]).
    """
    boxes = find_region_boxes(mask, keep_n=keep_n, grid=grid,
                              min_frac=min_frac)
    if not boxes:
        return None, None
    crop = crop_id_reference(first_frame, mask)
    if crop is None or crop.size == 0:
        return None, None
    bbox = object_bbox(mask)
    entry = [[list(bbox), None, []],
             [[int(b[0]), list(b[1]), list(b[2])] for b in boxes]]
    return entry, crop
