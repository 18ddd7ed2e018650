"""Adapter-construction seams shared by checkpoint loading and the
random-init timing benches (scripts/bench_perception.py,
scripts/bench_mass_eval.py): make_{tracker,segmenter,embedder}_adapter
must produce callables honoring the perception-backend contracts on
arbitrary (here tiny random) params."""

import jax
import numpy as np

from frameino_tpu.models.cotracker import (init_cotracker,
                                           make_tracker_adapter,
                                           tiny_cotracker_config)
from frameino_tpu.models.dinov2 import (init_dinov2, make_embedder_adapter,
                                        tiny_dinov2_config)
from frameino_tpu.models.sam2 import init_sam2, tiny_sam2_config
from frameino_tpu.models.sam2_video import make_segmenter_adapter


def test_tracker_adapter_contract():
    cfg = tiny_cotracker_config()
    params = init_cotracker(jax.random.key(0), cfg)
    track = make_tracker_adapter(params, cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (5, 32, 48, 3)).astype(np.uint8)
    queries = np.array([[10.0, 12.0], [30.0, 20.0]], np.float32)
    tracks = track(frames, queries)
    assert tracks.shape == (5, 2, 2)
    assert tracks.dtype == np.int64


def test_segmenter_adapter_contract():
    cfg = tiny_sam2_config()
    params = init_sam2(jax.random.key(0), cfg)
    segment = make_segmenter_adapter(params, cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 40, 56, 3)).astype(np.uint8)
    masks = segment(frames, np.array([[28.0, 20.0]], np.float32))
    assert masks.shape == (3, 40, 56)
    assert masks.dtype == np.uint8
    assert set(np.unique(masks)) <= {0, 1}


def test_embedder_adapter_contract():
    cfg = tiny_dinov2_config()
    params = init_dinov2(jax.random.key(0), cfg)
    embed = make_embedder_adapter(params, cfg, input_size=2 * cfg.patch_size)
    rng = np.random.default_rng(0)
    feat = embed(rng.integers(0, 255, (33, 47, 3)).astype(np.uint8))
    assert feat.ndim == 1
    assert np.isfinite(feat).all()
