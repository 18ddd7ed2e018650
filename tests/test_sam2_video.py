"""SAM2.1 video predictor: memory-selection rule, fixed-capacity slot
layout, and the end-to-end segmenter adapter (reference protocol:
``evaluation/evaluate_INO_VSeg_MAE.py:160-196`` — points on frame 0,
propagate, threshold logits at 0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frameino_tpu.models.sam2 import (SAM21_HIERA_LARGE, init_sam2,
                                      tiny_sam2_config)
from frameino_tpu.models.sam2_video import (Sam2VideoPredictor,
                                            _FrameOutput,
                                            get_1d_sine_pe)


@pytest.fixture(scope="module")
def tiny_predictor():
    cfg = tiny_sam2_config()
    params = init_sam2(jax.random.key(0), cfg)
    return cfg, Sam2VideoPredictor(params, cfg)


def _fake_out(cfg, hw, seed):
    rng = np.random.default_rng(seed)
    return _FrameOutput(
        mem=rng.standard_normal((hw, cfg.mem_dim)).astype(np.float32),
        obj_ptr=rng.standard_normal((cfg.d_model,)).astype(np.float32),
        low_res_mask=rng.standard_normal((1, 16, 16)).astype(np.float32))


def test_build_memory_rule(tiny_predictor):
    """Reference selection at stride 1: conditioning frame (tpos index
    num_maskmem-1) + the previous num_maskmem-1 frames (most recent at
    tpos index 0); past object pointers cond-first then t_diff 1,2,...,
    sine-encoded over t_diff_max and projected."""
    cfg, pred = tiny_predictor
    hw = pred.hw
    outs = {t: _fake_out(cfg, hw, t) for t in range(6)}
    state = {"num_frames": 10, "cond": {0: outs[0]},
             "non_cond": {t: outs[t] for t in range(1, 6)}}
    mem, pos, bias = pred._build_memory(state, 6)
    mem, pos, bias = map(np.asarray, (mem, pos, bias))
    tpos = np.asarray(pred.params["maskmem_tpos_enc"])[:, 0, 0, :]
    # slot 0: cond frame 0 @ tpos[num_maskmem-1]; slot 1: frame 4
    # (t_rel=2) @ tpos[1]; slot 2: frame 5 (t_rel=1) @ tpos[0]
    for slot, (frame, tidx) in enumerate([(0, 2), (4, 1), (5, 0)]):
        lo = slot * hw
        np.testing.assert_array_equal(mem[0, lo:lo + hw],
                                      outs[frame].mem)
        np.testing.assert_allclose(
            pos[0, lo:lo + hw], pred.maskmem_pos + tpos[tidx],
            atol=1e-6)
        assert (bias[0, lo:lo + hw] == 0).all()
    # pointers: cond (t_diff 6) then frames 5, 4, 3 (t_diff 1, 2, 3)
    split = pred.ptr_split
    lo = cfg.num_maskmem * hw
    expected_ptrs = np.concatenate(
        [outs[f].obj_ptr.reshape(split, cfg.mem_dim)
         for f in (0, 5, 4, 3)])
    n = expected_ptrs.shape[0]
    np.testing.assert_array_equal(mem[0, lo:lo + n], expected_ptrs)
    proj = pred.params["obj_ptr_tpos_proj"]
    pe = get_1d_sine_pe(np.array([6, 1, 2, 3], np.float32) / 3.0,
                        cfg.d_model)
    pe = pe @ np.asarray(proj["w"]) + np.asarray(proj["b"])
    np.testing.assert_allclose(pos[0, lo:lo + n],
                               np.repeat(pe, split, axis=0), atol=1e-5)
    assert (bias[0, lo:lo + n] == 0).all()
    assert (bias[0, lo + n:] < -1e29).all()


def test_build_memory_early_frame(tiny_predictor):
    """At t=1 only the conditioning frame exists: one spatial slot, one
    pointer, everything else masked."""
    cfg, pred = tiny_predictor
    hw = pred.hw
    state = {"num_frames": 10, "cond": {0: _fake_out(cfg, hw, 0)},
             "non_cond": {}}
    mem, pos, bias = pred._build_memory(state, 1)
    bias = np.asarray(bias)
    assert (bias[0, :hw] == 0).all()
    assert (bias[0, hw:cfg.num_maskmem * hw] < -1e29).all()
    lo = cfg.num_maskmem * hw
    assert (bias[0, lo:lo + pred.ptr_split] == 0).all()
    assert (bias[0, lo + pred.ptr_split:] < -1e29).all()


def test_video_predictor_end_to_end(tiny_predictor):
    cfg, pred = tiny_predictor
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 24, 32, 3)).astype(np.uint8)
    state = pred.init_state(frames)
    m0 = pred.add_new_points(state, 0, np.array([[16.0, 12.0]]),
                             np.array([1]))
    assert m0.shape == (24, 32)
    masks = dict(pred.propagate_in_video(state))
    assert sorted(masks) == [0, 1, 2, 3]
    for m in masks.values():
        assert m.shape == (24, 32) and np.isfinite(m).all()
    # determinism
    state2 = pred.init_state(frames)
    pred.add_new_points(state2, 0, np.array([[16.0, 12.0]]),
                        np.array([1]))
    masks2 = dict(pred.propagate_in_video(state2))
    for t in masks:
        np.testing.assert_array_equal(masks[t], masks2[t])


def test_segment_adapter(tiny_predictor, tmp_path):
    """load_sam2_jax round-trips a saved checkpoint dict and honors the
    perception 'segmenter' contract."""
    import torch
    cfg, pred = tiny_predictor
    # export the params back to a torch-style checkpoint via the mirror
    # contract: state dict consumed by sam2_from_state_dict; here we
    # just exercise the adapter path with the tiny mirror from
    # test_sam2 (kept self-contained: save a mirror state dict).
    from tests.test_sam2 import TSam2
    torch.manual_seed(1)
    tm = TSam2(cfg)
    path = tmp_path / "sam2_tiny.pt"
    torch.save({"model": tm.state_dict()}, path)
    from frameino_tpu.models.sam2_video import load_sam2_jax
    segment = load_sam2_jax(str(path), cfg)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (3, 24, 32, 3)).astype(np.uint8)
    out = segment(frames, np.array([[10.0, 10.0], [20.0, 14.0]]))
    assert out.shape == (3, 24, 32)
    assert out.dtype == np.uint8
    assert set(np.unique(out)) <= {0, 1}


def test_full_config_structure():
    cfg = SAM21_HIERA_LARGE
    assert cfg.depth == 48
    assert cfg.stage_ends == (1, 7, 43, 47)
    assert cfg.q_pool_blocks == (2, 8, 44)
    assert cfg.backbone_dims == (144, 288, 576, 1152)
    specs = cfg.block_spec()
    # window size lags the stage transition by one block
    assert specs[2]["window"] == 8 and specs[2]["q_pool"]
    assert specs[8]["window"] == 4 and specs[8]["q_pool"]
    assert specs[44]["window"] == 16 and specs[44]["q_pool"]
    for i in (23, 33, 43):
        assert specs[i]["window"] == 0
    assert specs[47]["heads"] == 16 and specs[47]["dim_out"] == 1152
