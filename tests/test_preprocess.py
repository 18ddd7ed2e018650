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


def test_text_area_score():
    """Full-IQA text detector: subtitled frame scores high, natural
    frames score ~0 (reference scoring_img.py:225-241 contract)."""
    import cv2
    from frameino_tpu.preprocess.image_scoring import (polygon_area,
                                                       text_area_score)
    img = np.full((240, 320, 3), 255, np.uint8)
    cv2.putText(img, "HELLO WORLD TEXT", (10, 60),
                cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 0, 0), 2)
    plain = np.full((240, 320, 3), 255, np.uint8)
    rs = np.random.RandomState(0)
    natural = cv2.GaussianBlur(
        rs.randint(0, 255, (240, 320, 3)).astype(np.uint8), (31, 31), 0)
    assert text_area_score(img) > 0.02
    assert text_area_score(plain) == 0.0
    assert text_area_score(natural) < 0.01
    # shoelace matches the rectangle area
    assert polygon_area([[0, 0], [4, 0], [4, 3], [0, 3]]) == 12.0
    # pluggable easyocr-format reader
    fake = lambda im: [([[0, 0], [10, 0], [10, 10], [0, 10]], "hi", 0.9)]
    assert abs(text_area_score(img, ocr_reader=fake)
               - 100.0 / (240 * 320)) < 1e-9


def test_aesthetic_and_complexity_scores():
    import cv2
    from frameino_tpu.preprocess.image_scoring import (aesthetic_score,
                                                       complexity_score,
                                                       score_images)
    rs = np.random.RandomState(0)
    noisy = rs.randint(0, 255, (120, 160, 3)).astype(np.uint8)
    flat = np.full((120, 160, 3), 128, np.uint8)
    assert complexity_score(noisy) > complexity_score(flat) + 0.3
    assert 1.0 <= aesthetic_score(noisy) <= 10.0
    assert 1.0 <= aesthetic_score(flat) <= 10.0
    # pluggable learned models override the classical stand-ins
    assert aesthetic_score(flat, model=lambda im: 7.5) == 7.5
    assert complexity_score(flat, model=lambda im: 0.42) == 0.42
    full = score_images(noisy, full=True)
    assert {"clarity", "brightness", "contrast", "text_area",
            "aesthetic", "complexity"} <= set(full)


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


def _textured(seed=0, h=96, w=128):
    return np.random.RandomState(seed).randint(
        0, 255, (h, w, 3)).astype(np.uint8)


def _shift(img, dx, dy=0):
    import cv2
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]),
                          borderMode=cv2.BORDER_REFLECT)


def test_classify_camera_motion_fixtures():
    """Static / pan (no parallax) / translate (two-depth parallax) /
    shake fixtures land in the right class (VERDICT r2 #7)."""
    from frameino_tpu.preprocess.camera_pose import classify_camera_motion
    base = _textured()

    static = np.stack([base] * 8)
    assert classify_camera_motion(static)["class"] == "static"

    pan = np.stack([_shift(base, 3 * t) for t in range(8)])
    assert classify_camera_motion(pan)["class"] == "pan"

    # two-depth scene as interleaved 16px stripes: far stripes move
    # 1px/frame, near stripes 5px/frame. The oscillating-in-y flow
    # field is genuine parallax no single homography can fit (a smooth
    # top/bottom split CAN be absorbed by perspective terms).
    far, near = _textured(1), _textured(2)
    frames = []
    for t in range(8):
        f = _shift(far, 1 * t).copy()
        n = _shift(near, 5 * t)
        for y0 in range(16, 96, 32):
            f[y0:y0 + 16] = n[y0:y0 + 16]
        frames.append(f)
    out = classify_camera_motion(np.stack(frames))
    assert out["class"] == "translate"
    assert out["mean_h_residual_px"] > 1.5

    shake = np.stack([_shift(base, 4 * (-1) ** t) for t in range(8)])
    assert classify_camera_motion(shake)["class"] == "shake"


def test_reference_pose_error_math():
    """compute_pose_error / calculate_camera_motion reproduce the
    reference aggregation (make_delete_lists_camera.py:24-110)."""
    from frameino_tpu.preprocess.camera_pose import (calculate_camera_motion,
                                                     compute_pose_error)
    # 30 deg rotation about z
    th = np.radians(30)
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    te, re, fe = compute_pose_error(np.eye(3), np.zeros(3), 100.0,
                                    Rz, np.array([3.0, 4.0, 0.0]), 110.0)
    assert abs(re - 30.0) < 1e-6
    assert abs(te - 5.0) < 1e-9
    assert abs(fe - 10.0) < 1e-9
    info = {"rotation": [np.eye(3).tolist(), Rz.tolist(), Rz.tolist()],
            "translation": [[0, 0, 0], [3, 4, 0], [3, 4, 0]],
            "focal_x": [100.0, 110.0, 110.0],
            "focal_y": [100.0, 110.0, 110.0]}
    r, t, f = calculate_camera_motion(info)
    assert abs(r - 15.0) < 1e-6      # (30 + 0) / 2
    assert abs(t - 2.5) < 1e-9       # (5 + 0) / 2
    assert abs(f - 5.0) < 1e-9


def test_percentile_delete_list():
    """Rank-range pruning: delete_ranges fractions of the sorted list."""
    from frameino_tpu.preprocess.camera_pose import (
        make_camera_delete_list, percentile_delete_set)
    scores = [(float(i), f"v{i}") for i in range(10)]
    deleted = percentile_delete_set(scores, (0.6, 1.0))
    assert deleted == {"v6", "v7", "v8", "v9"}
    # full pipeline: the most-rotating clip lands in the delete set
    th = np.radians(40)
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    mild = {"rotation": [np.eye(3).tolist()] * 3,
            "translation": [[0, 0, 0]] * 3,
            "focal_x": [100.0] * 3, "focal_y": [100.0] * 3}
    wild = {"rotation": [np.eye(3).tolist(), Rz.tolist(),
                         (Rz @ Rz).tolist()],
            "translation": [[0, 0, 0], [5, 0, 0], [10, 0, 0]],
            "focal_x": [100.0] * 3, "focal_y": [100.0] * 3}
    infos = {"calm0": mild, "calm1": mild, "calm2": mild, "wild": wild}
    # fraction-based pruning (reference semantics): top 25% of each
    # ranking -> exactly the wildest clip
    ranges = {"rotation": (0.75, 1.0), "translation": (0.75, 1.0),
              "focal": (1.0, 1.0)}
    assert make_camera_delete_list(infos, ranges) == {"wild"}
    # the defaults delete the top 40% by rotation/translation — wild is
    # always in that set
    assert "wild" in make_camera_delete_list(infos)


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
    import pytest
    frames = np.zeros((2, 8, 8, 3), np.uint8)
    # no VLM + no opt-in must raise (constant template captions poison
    # text conditioning — VERDICT r2 weak #4)
    with pytest.raises(RuntimeError):
        caption_step(frames)
    assert isinstance(caption_step(frames, allow_template=True), str)


def test_template_captioner_is_content_dependent():
    """Offline smoke captions vary with the clip (not one constant)."""
    from frameino_tpu.preprocess.captioning import template_captioner
    red = np.zeros((2, 16, 16, 3), np.uint8)
    red[..., 0] = 200
    blue = np.zeros((2, 16, 16, 3), np.uint8)
    blue[..., 2] = 200
    assert template_captioner(red) != template_captioner(blue)


def test_caption_segments_protocol():
    """Reference sampling: [start : min(T, start+160) : 16], one
    caption per panoptic segment start (caption_qwen_multi.py:160-210)."""
    from frameino_tpu.preprocess.captioning import (CAPTION_INSTRUCTION,
                                                    caption_segments)
    frames = np.zeros((40, 8, 8, 3), np.uint8)
    for t in range(40):
        frames[t] += t  # frame index tag
    calls = []

    def fake_vlm(sub, prompt):
        calls.append((sub.shape[0], [int(f[0, 0, 0]) for f in sub]))
        assert prompt == CAPTION_INSTRUCTION
        return f"caption of {sub.shape[0]} frames"

    caps = caption_segments(frames, [0, 30], vlm=fake_vlm)
    assert len(caps) == 2
    assert calls[0] == (3, [0, 16, 32])        # 0:160:16 clipped to T=40
    assert calls[1] == (1, [30])               # 30:40:16


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
    # manifest records the files actually fetched: part0 + the two
    # fallback chunks of part1 (never the failed primary zip)
    assert [os.path.basename(p) for p in done] == [
        "OpenVid_part0.zip", "OpenVid_part1_part0.zip",
        "OpenVid_part1_part1.zip"]
    vids = os.listdir(tmp_path / "videos")
    assert "v0.mp4" in vids            # flat extraction (basename only)
    assert any(v.startswith("v1_") for v in vids)


def test_qwen_captioner_message_protocol(monkeypatch):
    """load_qwen_captioner with a fake processor/model: the chat message
    carries the clip as a video entry + the structured instruction, and
    only the newly generated tokens are decoded
    (caption_qwen_multi.py:120-200)."""
    import torch
    from frameino_tpu.preprocess import captioning

    seen = {}

    class FakeInputs(dict):
        def to(self, device):
            return self

    class FakeProcessor:
        def apply_chat_template(self, messages, tokenize,
                                add_generation_prompt):
            seen["messages"] = messages
            assert add_generation_prompt
            return "CHAT"

        def __call__(self, text, images, videos, padding,
                     return_tensors):
            assert text == ["CHAT"] and images is None
            seen["videos"] = videos
            return FakeInputs(input_ids=torch.zeros((1, 4), dtype=torch.long))

        def batch_decode(self, ids, skip_special_tokens,
                         clean_up_tokenization_spaces):
            seen["decoded_len"] = ids.shape[1]
            return ["a generated caption"]

    class FakeModel:
        device = "cpu"

        def generate(self, input_ids=None, max_new_tokens=0, **kw):
            return torch.zeros((1, input_ids.shape[1] + 3), dtype=torch.long)

    monkeypatch.setattr("frameino_tpu.evaluation.perception.load_qwen_vl",
                        lambda *a, **k: (FakeProcessor(), FakeModel()))
    vlm = captioning.load_qwen_captioner("fake/model")
    frames = np.zeros((5, 8, 8, 3), np.uint8)
    out = captioning.caption_step(frames, vlm=vlm)
    assert out == "a generated caption"
    content = seen["messages"][0]["content"]
    assert content[0]["type"] == "video"
    assert content[1] == {"type": "text",
                          "text": captioning.CAPTION_INSTRUCTION}
    assert seen["videos"][0].shape == (5, 3, 8, 8)   # TCHW clip
    assert seen["decoded_len"] == 3                  # new tokens only


def test_sam2_refine_protocol():
    """SAM2_Refine semantics (track_FrameINO.py:215-398): main + aux
    crops, point invalidation + skip-ratio gate, region boxes
    overlapping the mask dropped."""
    from frameino_tpu.preprocess.frameino_labeling import sam2_refine

    T, H, W = 6, 64, 96
    frames = np.full((T, H, W, 3), 50, np.uint8)
    # object: a bright square occupying >= 10% of the frame
    for t in range(T):
        frames[t, 10:42, 10 + t:58 + t] = 220

    def segmenter(sub, points):
        return np.stack([(f.mean(-1) > 100).astype(np.uint8)
                         for f in sub])

    tracks = [[[20 + t, 20], [30 + t, 30]] for t in range(T)]
    region_boxes = [
        (500, (60, 44), (90, 60)),    # clear of the object
        (500, (12, 12), (30, 30)),    # overlaps -> dropped
    ]
    seg_info, useful, valid, crops = sam2_refine(
        frames, tracks, segmenter, region_boxes)
    assert seg_info and seg_info[1] == 0
    assert all(valid)
    assert len(useful) == 1 and useful[0][1] == (60, 44)
    assert crops[0].shape[0] == 32                  # bbox-height crop
    assert len(crops) == 1 + len(seg_info[2])

    # points off the object -> invalidated -> skip-ratio rejection
    bad_tracks = [[[2, 2], [3, 3]] for _ in range(T)]
    out = sam2_refine(frames, bad_tracks, segmenter, region_boxes)
    assert out == ([], [], [], [])
