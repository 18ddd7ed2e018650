"""End-to-end smoke test of the training CLI: synthetic dataset ->
train steps -> checkpoint -> resume."""

import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

from frameino_tpu.data import write_video

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def smoke_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("smoke")
    data = root / "data"
    for d in ("csvs", "videos", "ids"):
        (data / d).mkdir(parents=True)

    H, W, F = 48, 64, 30
    rs = np.random.RandomState(0)
    write_video(str(data / "videos" / "v0.mp4"),
                rs.randint(0, 255, (F, H, W, 3)).astype(np.uint8), fps=12)
    Image.fromarray(rs.randint(0, 255, (20, 16, 3)).astype(np.uint8)).save(
        data / "ids" / "obj0.png")

    def track(x0, y0, dx):
        return [[[x0 + dx * t, y0 + 0.5 * t]] for t in range(F)]

    with open(data / "csvs" / "d.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_path", "height", "width", "valid_duration",
                    "Panoptic_Segmentation", "Structured_Text_Prompt",
                    "Track_Traj", "Obj_Info", "ID_info"])
        for _ in range(2):   # two rows so the dp=2 global batch fills
            w.writerow(["v0.mp4", H, W, json.dumps([0, F]),
                        json.dumps([[]]), json.dumps(["toy moves"]),
                        json.dumps([[track(2, 5, 1.0)]]),
                        json.dumps([[["person", 0]]]),
                        json.dumps([[[[[0, 0, 9, 9], "obj0.png", []],
                                      [[500, [5, 2], [62, 46]]]], ]])])

    cfg = {
        "experiment_name": "smoke",
        "download_folder_path": str(data),
        "train_csv_relative_path": "csvs",
        "train_video_relative_path": "videos",
        "train_ID_relative_path": "ids",
        "target_height": 32, "target_width": 64,
        "sample_accelerate_factor": 1,
        "train_frame_num_range": [13, 13], "min_train_frame_num": 9,
        "dot_radius": 7, "drop_FrameIn_prob": 0.0,
        "max_train_steps": 2, "train_batch_size": 1,
        "checkpointing_steps": 2, "checkpoints_total_limit": 2,
        "gradient_checkpointing": False,
        "learning_rate": 1e-4, "lr_warmup_steps": 1,
        "resume_from_checkpoint": "latest",
        "output_folder": str(root / "ckpts"),
        "max_text_seq_length": 8,
        "first_iter_validation": True,
        "num_inference_steps": 2,
        "seed": 0,
    }
    cfg_path = root / "smoke.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, cfg_path


def _run(cfg_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "train_wan_motion_frameino.py"),
         "--config_path", str(cfg_path), "--smoke"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)


def test_train_and_resume(smoke_env):
    root, cfg_path = smoke_env
    r = _run(cfg_path)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "done at step 2" in r.stdout, r.stdout
    ckpt_dir = root / "ckpts" / "smoke"
    assert (ckpt_dir / "checkpoint-2").exists()
    # data-iterator state rides in the checkpoint metadata so a resumed
    # run continues the interrupted epoch exactly (ResumableEpochIterator)
    import json
    meta = json.loads((ckpt_dir / "checkpoint-2" / "metadata.json")
                      .read_text())
    assert "epoch_seed" in meta and "batches_done" in meta, meta
    # first-iter validation smoke-tests the whole inference stack
    val_dir = ckpt_dir / "validation_step0"
    assert (val_dir / "generated.mp4").exists()
    assert (val_dir / "first_frame_canvas.png").exists()

    # resume: should load step 2 and exit immediately at max_steps
    r2 = _run(cfg_path)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "resumed from" in r2.stdout, r2.stdout
