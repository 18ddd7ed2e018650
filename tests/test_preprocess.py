"""Preprocess pipeline tests: every step runs offline end to end."""

import numpy as np
import pytest

from frameino_tpu.preprocess import (filter_basic, find_region_boxes,
                                     longest_clean_span,
                                     motion_magnitude_filter,
                                     sample_points_from_mask, score_images,
                                     score_scene_cuts)
from frameino_tpu.preprocess.camera_pose import prune_by_pose_error
from frameino_tpu.preprocess.captioning import caption_step
from frameino_tpu.preprocess.frameino_labeling import (crop_id_reference,
                                                       object_bbox)
from frameino_tpu.preprocess.panoptic import (connected_component_panoptic,
                                              run_panoptic_step)


def test_filter_basic():
    rows = [
        {"height": 720, "width": 1280, "num_frames": 100},
        {"height": 100, "width": 100, "num_frames": 100},   # too small
        {"height": 720, "width": 1280, "num_frames": 10},   # too short
        {"height": 480, "width": 1920, "num_frames": 100},  # aspect 4.0
    ]
    kept, rejected = filter_basic(rows)
    assert len(kept) == 1 and len(rejected) == 3


def test_scene_cut_detection():
    rs = np.random.RandomState(0)
    a = rs.randint(100, 110, (10, 8, 8, 3)).astype(np.uint8)
    b = rs.randint(0, 10, (15, 8, 8, 3)).astype(np.uint8)   # hard cut at 10
    frames = np.concatenate([a, b])
    scores = score_scene_cuts(frames)
    assert scores.argmax() == 10
    span = longest_clean_span(scores, threshold=0.5)
    assert span == (10, 25)


def test_image_scoring():
    sharp = np.zeros((32, 32, 3), np.uint8)
    sharp[::2] = 255                                        # high frequency
    blurry = np.full((32, 32, 3), 128, np.uint8)
    assert score_images(sharp)["clarity"] > score_images(blurry)["clarity"]


def test_panoptic_point_sampling():
    mask = np.zeros((16, 16), bool)
    mask[4:8, 4:8] = True
    pts = sample_points_from_mask(mask, 5)
    assert len(pts) == 5
    for (x, y) in pts:
        assert mask[y, x]


def test_panoptic_step_with_cc_baseline():
    frame = np.zeros((32, 32, 3), np.uint8)
    frame[5:15, 5:15] = 255
    frames = frame[None]
    obj_info, seg = run_panoptic_step(frames, connected_component_panoptic)
    assert len(obj_info[0]) == 1
    assert len(seg[0][0]) > 0


def test_motion_filter():
    static = [[[10.0, 10.0]]] * 10
    moving = [[[float(t * 3), 10.0]] for t in range(10)]
    kept = motion_magnitude_filter([static, moving], min_magnitude=5.0)
    assert len(kept) == 1
    assert kept[0][1][0][0] == 3.0


def test_camera_pose_prune():
    static = np.tile(np.eye(4), (10, 1, 1))
    assert prune_by_pose_error(static, min_path=0.1) is False
    moving = static.copy()
    moving[:, 0, 3] = np.linspace(0, 1, 10)
    assert prune_by_pose_error(moving, min_path=0.1) is True


def test_region_boxes_exclude_object():
    mask = np.zeros((64, 64), bool)
    mask[2:10, 2:10] = True                                 # top-left object
    boxes = find_region_boxes(mask, keep_n=3)
    assert boxes
    ob = object_bbox(mask)
    for _, (tlx, tly), (brx, bry) in boxes:
        ox = max(0, min(brx, ob[2]) - max(tlx, ob[0]))
        oy = max(0, min(bry, ob[3]) - max(tly, ob[1]))
        assert not (ox > 0 and oy > 0)                      # no overlap

    crop = crop_id_reference(np.full((64, 64, 3), 200, np.uint8), mask)
    assert crop is not None and crop.max() == 200


def test_caption_step_fallback():
    frames = np.zeros((2, 8, 8, 3), np.uint8)
    assert isinstance(caption_step(frames), str)


def test_motion_segmenter_finds_moving_object():
    """Camera-compensated motion segmentation: a moving square over a
    static textured background yields one instance at its location."""
    import numpy as np
    from frameino_tpu.preprocess.panoptic import motion_segmenter
    rs = np.random.RandomState(0)
    bg = rs.randint(10, 60, (64, 96, 3)).astype(np.uint8)
    frames = []
    for t in range(24):
        f = bg.copy()
        x = 8 + 2 * t
        f[20:36, x:x + 16] = (220, 180, 60)
        frames.append(f)
    segs = motion_segmenter(np.stack(frames))
    assert segs, "no moving object found"
    label, mask = max(segs, key=lambda s: s[1].sum())
    # the largest mover overlaps the square's frame-0 box
    assert mask[20:36, 8:24].sum() > 0.2 * 16 * 16
    # static background is mostly excluded
    assert mask.sum() < 0.3 * mask.size


def test_prepare_openvid_csv(tmp_path):
    """Step-0 CSV prep: join master CSV with present files, shard."""
    import csv as _csv
    import os
    from frameino_tpu.preprocess.dataset_download import prepare_openvid_csv
    vids = tmp_path / "videos"
    vids.mkdir()
    (vids / "a.mp4").write_bytes(b"x")
    (vids / "c.mp4").write_bytes(b"x")
    master = tmp_path / "OpenVid-1M.csv"
    with open(master, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["video", "caption", "fps"])
        w.writerow(["a.mp4", "a cat", 24])
        w.writerow(["b.mp4", "missing file", 24])
        w.writerow(["c.mp4", "a dog", 24])
    out = tmp_path / "csvs"
    n = prepare_openvid_csv(str(master), str(vids), str(out),
                            division_num=2)
    assert n == 2
    rows = []
    for name in sorted(os.listdir(out)):
        with open(out / name) as f:
            r = list(_csv.reader(f))
            assert r[0] == ["ID", "video_path", "provided_text"]
            rows += r[1:]
    assert len(rows) == 2
    assert rows[0][2] == "a cat" and rows[1][2] == "a dog"


def test_download_openvid_with_fake_opener(tmp_path):
    """Download step with an injected opener: zip parts extract flat;
    a failing part falls back to the split URLs then logs."""
    import os
    import zipfile as _zf
    from frameino_tpu.preprocess.dataset_download import download_openvid

    def make_zip(dst, names):
        with _zf.ZipFile(dst, "w") as z:
            for n in names:
                z.writestr(n, b"videodata")

    calls = []

    def opener(url, dst):
        calls.append(url)
        if url.endswith("OpenVid_part0.zip"):
            make_zip(dst, ["sub/v0.mp4"])
        elif url.endswith("OpenVid_part1.zip"):
            raise IOError("too big")
        elif url.endswith("OpenVid_part1_part0.zip"):
            make_zip(dst, ["v1_0.mp4"])
        elif url.endswith("OpenVid_part1_part1.zip"):
            make_zip(dst, ["v1_1.mp4"])
        else:
            raise AssertionError(url)

    done = download_openvid(str(tmp_path), 0, 2, url_opener=opener)
    assert len(done) == 2
    vids = os.listdir(tmp_path / "videos")
    assert "v0.mp4" in vids            # flat extraction (basename only)
    assert any(v.startswith("v1_") for v in vids)
