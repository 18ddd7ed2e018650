"""Data layer tests: synthetic CSV+video fixture through FrameINODataset,
trajectory rasterizer parity properties, sampler behavior, flow utils."""

import csv
import json
import os

import numpy as np
import pytest
from PIL import Image

from frameino_tpu.data import (FrameINODataset, FrameINODatasetConfig,
                               MixedBatchSampler, decode_video,
                               rasterize_trajectories,
                               resample_track_by_length, write_video)
from frameino_tpu.utils.optical_flow import (bivariate_gaussian,
                                             filter_uv, flow_to_image)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    """Synthetic FrameINO dataset: one 64x48 video, one ID crop, one CSV."""
    root = tmp_path_factory.mktemp("frameino_data")
    (root / "csvs").mkdir()
    (root / "videos").mkdir()
    (root / "ids").mkdir()

    H, W, F = 48, 64, 30
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (F, H, W, 3)).astype(np.uint8)
    write_video(str(root / "videos" / "v0.mp4"), frames, fps=12)

    Image.fromarray(rs.randint(0, 255, (20, 16, 3)).astype(np.uint8)).save(
        root / "ids" / "obj0.png")

    # two objects, tracks over all frames
    def track(x0, y0, dx):
        return [[[x0 + dx * t, y0 + 0.5 * t], [x0 + 5 + dx * t, y0 + 2]]
                for t in range(F)]

    obj_info = [[["person", 0], ["car", 0]]]
    track_traj = [[track(2, 5, 1.0), track(30, 20, -0.5)]]
    # ID_info[main][0] = (bbox_info, ref_path, store_paths); [1] = region
    # boxes [size, (tl), (br)]
    id_info = [[
        [[[0, 0, 10, 10], "obj0.png", []],
         [[300, [10, 5], [60, 40]], [500, [5, 2], [62, 46]]]],
        [],
    ]]

    with open(root / "csvs" / "data.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_path", "height", "width", "valid_duration",
                    "Panoptic_Segmentation", "Structured_Text_Prompt",
                    "Track_Traj", "Obj_Info", "ID_info"])
        w.writerow(["v0.mp4", 48, 64, json.dumps([0, 30]),
                    json.dumps([[]]), json.dumps(["a red toy moves in"]),
                    json.dumps(track_traj), json.dumps(obj_info),
                    json.dumps(id_info)])
    return str(root)


CFG = FrameINODatasetConfig(
    target_height=32, target_width=64, sample_accelerate_factor=1,
    train_frame_num_range=(13, 13), min_train_frame_num=9, dot_radius=7,
    drop_FrameIn_prob=0.0)


class TestFrameINODataset:
    def test_item_contract(self, fixture_root):
        ds = FrameINODataset(CFG, fixture_root, "csvs", "videos", "ids",
                             seed=0)
        assert len(ds) == 1
        item = ds[0]
        F = item["video_tensor"].shape[0]
        assert F % 4 == 1 and F >= 9
        assert item["video_tensor"].shape == (F, 3, 32, 64)
        assert item["traj_tensor"].shape == (F, 3, 32, 64)
        assert item["first_frame_tensor"].shape == (3, 32, 64)
        assert item["ID_tensor"].shape == (3, 32, 64)
        assert item["video_tensor"].min() >= -1 and \
            item["video_tensor"].max() <= 1
        assert isinstance(item["text_prompt"], str)

    def test_canvas_masked_outside_region(self, fixture_root):
        ds = FrameINODataset(CFG, fixture_root, "csvs", "videos", "ids",
                             strict_validation_match=True, seed=0)
        item = ds[0]
        ff = item["first_frame_np"]
        box = item["processed_meta_data"]["resized_mask_region_box"]
        (tlx, tly), (brx, bry) = box
        # outside the region box must be black
        assert ff[:tly].sum() == 0 and ff[bry:].sum() == 0
        assert ff[:, :tlx].sum() == 0 and ff[:, brx:].sum() == 0
        assert ff[tly:bry, tlx:brx].sum() > 0

    def test_frameout_only_black_id(self, fixture_root):
        ds = FrameINODataset(CFG, fixture_root, "csvs", "videos", "ids",
                             FrameOut_only=True, seed=0)
        item = ds[0]
        np.testing.assert_allclose(item["ID_np"], 0)
        # main-object points dropped -> tracks only from non-main objects
        tracks = item["processed_meta_data"]["full_pred_tracks"][0]
        assert len(tracks) == 2

    def test_video_roundtrip(self, fixture_root):
        v = decode_video(os.path.join(fixture_root, "videos", "v0.mp4"))
        assert v.shape == (30, 48, 64, 3)


class TestTrajRaster:
    def test_rasterize_colors_and_dilation(self):
        tracks = [[[(10, 10)], [(40, 20)]], [[(12, 10)], [(38, 20)]]]
        traj, raw, _ = rasterize_trajectories(tracks, 48, 64, 7, 64, 48)
        assert traj.shape == (2, 3, 48, 64) and raw.shape == (2, 48, 64, 3)
        # first object red-ish at its dot, second blue... (color 1 vs 0)
        assert raw[0, 10, 10, 0] > 150          # red channel high
        assert raw[0, 20, 40, 1] > 100          # yellow (2nd color) has G
        # corners stay white
        assert (raw[0, 0, 0] > 240).all()

    def test_out_of_bounds_points_skipped(self):
        tracks = [[[(-5, 10), (100, 10)]]]
        _, raw, _ = rasterize_trajectories(tracks, 48, 64, 7, 64, 48)
        assert (raw > 240).all()                # nothing drawn

    def test_resample_by_length(self):
        pts = [(0, 0), (10, 0)]
        out = resample_track_by_length(pts, 5)
        np.testing.assert_allclose(out[:, 0], [0, 2.5, 5, 7.5, 10])
        np.testing.assert_allclose(out[:, 1], 0)


class TestSampler:
    def test_homogeneous_batches(self):
        s = MixedBatchSampler([10, 6], batch_size=2, seed=1)
        batches = list(s)
        assert len(batches) == 8
        for b in batches:
            src = [0 if i < 10 else 1 for i in b]
            assert len(set(src)) == 1           # never mixes datasets
        flat = sorted(i for b in batches for i in b)
        assert flat == list(range(16))

    def test_epoch_changes_order(self):
        s = MixedBatchSampler([8], batch_size=2, seed=1)
        a = list(s)
        s.set_epoch(1)
        b = list(s)
        assert a != b


class TestResumableEpochIterator:
    """Mid-epoch checkpoint/resume replays exactly the uninterrupted
    batch sequence (beyond the reference, which only restores the epoch
    number — train_wan_motion_FrameINO.py:1096)."""

    def _uninterrupted(self, n_epochs):
        from frameino_tpu.data.sampler import ResumableEpochIterator
        s = MixedBatchSampler([10, 6], batch_size=2, seed=3)
        it = ResumableEpochIterator(s)
        out = []
        for e in range(n_epochs):
            for b in it.epoch(default_seed=len(out)):
                out.append(b)
                it.advance()
            it.end_epoch()
        return out

    def test_mid_epoch_resume_exact_continuation(self):
        import json
        from frameino_tpu.data.sampler import ResumableEpochIterator

        ref = self._uninterrupted(2)
        for stop_after in (1, 3, 7, 8, 11):   # incl. an epoch boundary
            s = MixedBatchSampler([10, 6], batch_size=2, seed=3)
            it = ResumableEpochIterator(s)
            consumed = []
            # run until "interrupted" after stop_after batches
            while len(consumed) < stop_after:
                for b in it.epoch(default_seed=len(consumed)):
                    consumed.append(b)
                    it.advance()
                    if len(consumed) >= stop_after:
                        break
                else:
                    it.end_epoch()
            # checkpoint metadata must round-trip through JSON
            meta = json.loads(json.dumps(it.meta()))
            # resume in a fresh process: new sampler + iterator from meta
            s2 = MixedBatchSampler([10, 6], batch_size=2, seed=3)
            it2 = ResumableEpochIterator(s2, meta)
            while len(consumed) < len(ref):
                for b in it2.epoch(default_seed=len(consumed)):
                    consumed.append(b)
                    it2.advance()
                    if len(consumed) >= len(ref):
                        break
                else:
                    it2.end_epoch()
            assert consumed == ref, f"diverged after resume@{stop_after}"

    def test_fresh_start_meta_is_inert(self):
        from frameino_tpu.data.sampler import ResumableEpochIterator
        s = MixedBatchSampler([8], batch_size=2, seed=1)
        # a final-save metadata blob ({"final": True, epoch_seed: None})
        # must behave exactly like no metadata
        it = ResumableEpochIterator(
            s, {"final": True, "epoch_seed": None, "batches_done": 3})
        assert it.epoch(default_seed=0) == \
            ResumableEpochIterator(MixedBatchSampler(
                [8], batch_size=2, seed=1)).epoch(default_seed=0)


class TestFlowUtils:
    def test_gaussian_kernel_normalized(self):
        k = bivariate_gaussian(45, 3, 3, 0, isotropic=True)
        assert k.shape == (45, 45)
        np.testing.assert_allclose(k.sum(), 1.0, atol=1e-9)
        assert k[22, 22] == k.max()             # centered peak

    def test_flow_to_image(self):
        flow = np.zeros((8, 8, 2), np.float32)
        flow[..., 0] = 1.0
        img = flow_to_image(flow)
        assert img.shape == (8, 8, 3) and img.dtype == np.uint8

    def test_filter_uv(self):
        """Matches the reference quirk (optical_flow_utils.py:142-148):
        the keep mask is randn >= (1 - sample_prob), so even
        sample_prob=1.0 keeps only ~50% of vectors."""
        rng = np.random.default_rng(0)
        flow = np.ones((64, 64, 2), np.float32)
        flow[0, 0] = 0.01
        out = filter_uv(flow.copy(), threshold_factor=0.5, sample_prob=1.0,
                        rng=rng)
        np.testing.assert_allclose(out[0, 0], 0)      # sub-threshold zeroed
        keep_rate = (out[1:] != 0).mean()
        assert 0.4 < keep_rate < 0.6


def test_stage1_motion_dataset(fixture_root):
    from frameino_tpu.data import MotionDataset
    cfg = FrameINODatasetConfig(
        target_height=32, target_width=64, sample_accelerate_factor=1,
        train_frame_num_range=(13, 13), min_train_frame_num=9, dot_radius=7,
        point_keep_ratio_regular=1.0)
    ds = MotionDataset(cfg, fixture_root, "csvs", "videos", "ids", seed=0)
    item = ds[0]
    F = item["video_tensor"].shape[0]
    assert F % 4 == 1
    assert item["ID_tensor"] is None
    # stage-1 first frame is the REAL frame (no canvas masking)
    np.testing.assert_array_equal(item["first_frame_np"],
                                  item["video_gt_np"][0])
    assert item["traj_tensor"].shape == (F, 3, 32, 64)
