"""Serving-shape bucketing (core/shape_buckets): round-up lattice,
pad/crop inverse, VAE frame constraint. VERDICT r3 missing #4 — the
reference serves any x32 canvas (app.py:316-333); under XLA that is a
13-17 s compile per shape without bucketing."""

import numpy as np
import pytest

from frameino_tpu.core import shape_buckets as SB


def test_bucket_hw_rounds_up():
    assert SB.bucket_hw(480, 832) == (512, 832)
    assert SB.bucket_hw(448, 640) == (448, 640)      # already on grid
    assert SB.bucket_hw(1, 1) == (64, 64)            # min side
    assert SB.bucket_hw(481, 833, grid=32) == (512, 864)


def test_bucket_hw_grid_must_be_x32():
    with pytest.raises(ValueError):
        SB.bucket_hw(480, 832, grid=48)


def test_bucket_frames_vae_constraint():
    # (F-1) % temporal == 0 — the causal-VAE rule
    assert SB.bucket_frames(49, temporal=4) == 49
    assert SB.bucket_frames(50, temporal=4) == 53
    assert SB.bucket_frames(1, temporal=4) == 1
    assert SB.bucket_frames(2, temporal=4) == 5
    # coarser lattice: frame_grid multiples only
    assert SB.bucket_frames(49, temporal=4, frame_grid=16) == 49
    assert SB.bucket_frames(50, temporal=4, frame_grid=16) == 65
    with pytest.raises(ValueError):
        SB.bucket_frames(49, temporal=4, frame_grid=6)


def test_pad_crop_inverse():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (30, 50, 3), dtype=np.uint8)
    padded = SB.pad_hwc(img, 64, 64)
    assert padded.shape == (64, 64, 3)
    assert (padded[:30, :50] == img).all()
    assert (padded[30:] == 0).all() and (padded[:, 50:] == 0).all()

    frames = rng.standard_normal((9, 64, 64, 3))
    out = SB.crop_video(frames, 5, 30, 50)
    np.testing.assert_array_equal(out, frames[:5, :30, :50])


def test_pad_rejects_oversize():
    with pytest.raises(ValueError):
        SB.pad_hwc(np.zeros((100, 10, 3), np.uint8), 64, 64)
