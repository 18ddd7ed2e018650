"""Stage-1 motion dataset (no ID reference, no unbounded canvas).

Reference ``data_loader/video_dataset_motion.py``: per CSV row, decode
at target resolution, temporally subsample a 4N+1 clip, keep tracking
points with ``point_keep_ratio_regular``, rasterize colored dilated
trajectory dots. The first frame is the REAL first frame (no region
masking) — that is the Stage-2 (FrameINO) extension.
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict

import numpy as np

from frameino_tpu.data.frameino_dataset import (FrameINODataset,
                                                FrameINODatasetConfig,
                                                _to_tensor_range)
from frameino_tpu.data.traj import rasterize_trajectories
from frameino_tpu.data.video_io import decode_video


class MotionDataset(FrameINODataset):
    """Reuses the CSV/point plumbing of the FrameINO dataset but without
    ID selection or canvas masking."""

    def _get(self, idx: int) -> Dict:
        cfg = self.cfg
        row = self.rows[idx]
        video_path = os.path.join(self.video_folder,
                                  self._field(row, "video_path"))
        original_height = int(self._field(row, "height"))
        original_width = int(self._field(row, "width"))
        valid_duration = json.loads(self._field(row, "valid_duration"))
        text_prompt = json.loads(
            self._field(row, "Structured_Text_Prompt"))[0]
        Track_Traj = json.loads(self._field(row, "Track_Traj"))[0]
        Obj_Info = json.loads(self._field(row, "Obj_Info"))[0]

        tw, th = cfg.target_width, cfg.target_height
        frame_start_idx = Obj_Info[0][1]

        video_np = decode_video(video_path, tw, th)
        video_np = video_np[valid_duration[0]:valid_duration[1]]
        valid_num = len(video_np)

        n_raw = self.rng.randint(*cfg.train_frame_num_range)
        accel = cfg.sample_accelerate_factor
        frame_end = min(valid_num, frame_start_idx + accel * n_raw)
        frame_end = frame_start_idx + 4 * math.floor(
            ((frame_end - frame_start_idx) - 1) / 4) + 1
        selected = video_np[frame_start_idx:frame_end:accel]
        if len(selected) < cfg.min_train_frame_num:
            raise ValueError("clip too short")
        F = len(selected)

        video_tensor = _to_tensor_range(selected).transpose(0, 3, 1, 2)
        first_frame_np = selected[0]
        first_frame_tensor = _to_tensor_range(first_frame_np
                                              ).transpose(2, 0, 1)

        full_pred_tracks = [[] for _ in range(F)]
        for obj_idx in range(len(Obj_Info)):
            tracks = Track_Traj[obj_idx][frame_start_idx:frame_end:accel]
            if len(tracks) != F:
                raise ValueError("track/video length mismatch")
            n_pts = len(tracks[0])
            keep = [self.rng.random() < cfg.point_keep_ratio_regular
                    for _ in range(n_pts)]
            for t in range(F):
                full_pred_tracks[t].append(
                    [tracks[t][p] for p in range(n_pts) if keep[p]])

        traj_tensor, traj_imgs_np, _ = rasterize_trajectories(
            full_pred_tracks, original_height, original_width,
            cfg.dot_radius, tw, th)

        return {
            "video_tensor": video_tensor,
            "traj_tensor": traj_tensor,
            "first_frame_tensor": first_frame_tensor,
            "ID_tensor": None,
            "text_prompt": text_prompt,
            "video_gt_np": selected,
            "first_frame_np": first_frame_np,
            "traj_imgs_np": traj_imgs_np,
            "gt_video_path": video_path,
            "processed_meta_data": {
                "full_pred_tracks": full_pred_tracks,
                "original_width": original_width,
                "original_height": original_height,
            },
        }
