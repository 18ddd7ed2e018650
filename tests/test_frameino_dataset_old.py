"""Old-schema (paper v1.0) eval dataset + driver integration.

Reference contract: ``data_loader/video_dataset_motion_FrameINO_old.py``
(CSV columns video_path,height,width,num_frames,fps,FrameIN_info,
Track_Traj,Improved_Text_Prompt,ID_info; returns main_reference_*).
"""

import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

from frameino_tpu.data import FrameINODatasetOld, write_video

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

H, W, F = 48, 64, 30


@pytest.fixture(scope="module")
def old_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("old_schema")
    for d in ("csvs", "videos", "ids"):
        (root / d).mkdir()
    rs = np.random.RandomState(0)
    write_video(str(root / "videos" / "v0.mp4"),
                rs.randint(0, 255, (F, H, W, 3)).astype(np.uint8), fps=16)
    Image.fromarray(rs.randint(0, 255, (20, 16, 3)).astype(np.uint8)).save(
        root / "ids" / "obj0.png")

    def track(x0, y0, dx):
        return [[[x0 + dx * t, y0 + 0.5 * t]] for t in range(F)]

    # one panoptic candidate, one object
    frame_in_info = [[["seg", 0, 1.0]]]          # (_, start_idx, fps_scale)
    track_traj = [[track(10, 5, 1.0)]]   # starts inside the region box
    id_info = [[[[[0, 0, 9, 9], "obj0.png", []],
                 [[500, [5, 2], [62, 46]]]]]]
    with open(root / "csvs" / "d.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_path", "height", "width", "num_frames", "fps",
                    "FrameIN_info", "Track_Traj", "Improved_Text_Prompt",
                    "ID_info"])
        for _ in range(2):
            w.writerow(["v0.mp4", H, W, F, 16.0,
                        json.dumps(frame_in_info), json.dumps(track_traj),
                        json.dumps(["a toy moves"]), json.dumps(id_info)])
    return root


def _make(old_fixture, **kw):
    cfg = {
        "dataset_folder_path": str(old_fixture / "videos"),
        "ID_folder_path": str(old_fixture / "ids"),
        "height": 32, "width": 64, "preset_decode_fps": 16,
        "train_frame_num": 13, "dot_radius": 45,
        "point_keep_ratio_regular": 1.0, "point_keep_ratio_ID": 1.0,
    }
    return FrameINODatasetOld(cfg, str(old_fixture / "csvs"),
                              seed=0, **kw)


def test_strict_deterministic(old_fixture):
    ds = _make(old_fixture, strict_validation_match=True)
    assert len(ds) == 2
    a = ds[0]
    b = _make(old_fixture, strict_validation_match=True)[0]
    np.testing.assert_array_equal(a["video_tensor"], b["video_tensor"])
    np.testing.assert_array_equal(a["traj_tensor"], b["traj_tensor"])
    assert a["video_tensor"].shape == (13, 3, 32, 64)
    assert a["main_reference_tensor"].shape == (3, 32, 64)
    assert a["main_reference_np"].dtype == np.uint8
    # old schema: video is NOT masked, first frame IS masked
    assert a["text_prompt"] == "a toy moves"
    meta = a["processed_meta_data"]
    assert len(meta["full_pred_tracks"]) == 13


def test_frameout_one_point(old_fixture):
    ds = _make(old_fixture, FrameOut_only=True, one_point_one_obj=True,
               strict_validation_match=True)
    item = ds[0]
    # black main reference placeholder in FrameOut mode
    assert item["main_reference_np"].max() == 0
    for fr in item["processed_meta_data"]["full_pred_tracks"]:
        assert len(fr) == 1


@pytest.mark.slow
def test_eval_driver_old_schema(old_fixture, tmp_path):
    """Driver runs against an old-schema fixture CSV and writes
    Main_Reference.png + results.json (VERDICT r1 item 9)."""
    cfg = {
        "download_folder_path": str(old_fixture),
        "validation_csv_relative_path": "csvs",
        "validation_video_relative_path": "videos",
        "validation_ID_relative_path": "ids",
        "target_height": 32, "target_width": 64,
        "train_frame_num_range": [13, 13],
        "preset_decode_fps": 16,
        "dot_radius": 45, "num_inference_steps": 2,
        "max_text_seq_length": 8, "guidance_scale": 5.0,
    }
    cfg_path = tmp_path / "eval_old.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out_dir = tmp_path / "results"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "run_frameino_mass_evaluation.py"),
         "--config_path", str(cfg_path), "--output_dir", str(out_dir),
         "--mode", "frame_in", "--family", "wan", "--smoke",
         "--num_instances", "1", "--schema", "old"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    inst = out_dir / "instance0"
    assert (inst / "Main_Reference.png").exists()
    assert (out_dir / "results.json").exists()
