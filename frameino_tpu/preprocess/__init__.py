"""Dataset-curation ("preprocess") pipeline.

TPU-native counterpart of the reference's nine-step CLI pipeline
(``preprocess/README.md:17-115``). Every step reads/writes CSV folders;
compute-light steps are fully implemented, perception-model-heavy steps
(panoptic segmentation, 3D camera tracking, VLM captioning, point
tracking, SAM refinement) take pluggable model callables with the same
contracts the reference fills with OneFormer / SpaTrackV2 / Qwen2.5-VL /
CoTracker3 / SAM2 — plus built-in cheap baselines so the pipeline runs
end to end offline.

Step map (reference script -> this package):
  0 csv_prepare                -> csv_io.build_initial_csv
  1 filter_basic.py            -> basic_filter.filter_basic
  2 scoring_scene_cut_autoshot -> scene_cut.score_scene_cuts (+ prune)
  3 scoring_img.py             -> image_scoring.score_images (+ prune)
  4 filter_panoptic_multi.py   -> panoptic.run_panoptic_step
  5 track_camera_pose_*        -> camera_pose.prune_by_pose_error
  6 caption_qwen_multi.py      -> captioning.caption_step
  7 track_regular_motion_cycle -> motion_tracking.track_step (+ filter)
  8 track_FrameINO.py          -> frameino_labeling.label_step
"""

from frameino_tpu.preprocess import csv_io
from frameino_tpu.preprocess.basic_filter import filter_basic
from frameino_tpu.preprocess.scene_cut import (score_scene_cuts,
                                               longest_clean_span)
from frameino_tpu.preprocess.image_scoring import score_images
from frameino_tpu.preprocess.panoptic import sample_points_from_mask
from frameino_tpu.preprocess.motion_tracking import motion_magnitude_filter
from frameino_tpu.preprocess.frameino_labeling import find_region_boxes
from frameino_tpu.preprocess.lk_tracker import lk_track_cycle, make_lk_tracker
from frameino_tpu.preprocess.panoptic import motion_segmenter
from frameino_tpu.preprocess.camera_pose import (camera_motion_stats,
                                                 keep_by_camera_motion)
