"""Demo app core tests: canvas geometry, ID prep, end-to-end session."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.app import (CanvasSpec, InteractiveSession, build_canvas,
                              crop_padding, prepare_id_reference,
                              tracks_to_traj_tensor)
from frameino_tpu.models import wan_dit, wan_vae
from frameino_tpu.pipelines import wan_i2v as P


class TestCanvas:
    def test_build_canvas_black_vs_white(self):
        img = np.full((16, 16, 3), 100, np.uint8)
        spec = CanvasSpec(32, 64, 16, 16, 8, 8)
        inf, vis = build_canvas(img, spec)
        assert inf.shape == (32, 64, 3)
        assert inf[0, 0].sum() == 0          # black outside
        assert (vis[0, 0] == 255).all()      # white outside
        assert (inf[8:24, 8:24] == 100).all()

    def test_canvas_dims_must_be_x32(self):
        with pytest.raises(ValueError):
            CanvasSpec(30, 64, 16, 16, 0, 0).validate()

    def test_placement_bounds(self):
        with pytest.raises(ValueError):
            CanvasSpec(32, 64, 16, 16, 60, 0).validate()

    def test_crop_padding_inverse(self):
        img = np.random.RandomState(0).randint(0, 255, (16, 16, 3)
                                               ).astype(np.uint8)
        spec = CanvasSpec(32, 64, 16, 16, 4, 8)
        inf, _ = build_canvas(img, spec)
        video = np.stack([inf] * 3)
        back = crop_padding(video, spec)
        np.testing.assert_array_equal(back[0], img)


class TestIDPrep:
    def test_masked_and_padded(self):
        img = np.full((20, 10, 3), 200, np.uint8)
        mask = np.zeros((20, 10), np.uint8)
        mask[5:15, 2:8] = 1
        out = prepare_id_reference(img, mask, 32, 64)
        assert out.shape == (32, 64, 3)
        assert out[0, 0].sum() == 0          # padding
        assert out.max() == 200

    def test_none_gives_black(self):
        out = prepare_id_reference(None, None, 32, 64)
        np.testing.assert_array_equal(out, 0)


class TestTrajFromClicks:
    def test_polyline_rasterized(self):
        # dot radius rescales by canvas_height/384, so use a radius large
        # enough to survive small test canvases
        traj, raw = tracks_to_traj_tensor([[(5, 5), (50, 20)]], 5, 32, 64,
                                          dot_radius=60)
        assert traj.shape == (5, 3, 32, 64)
        # dots move across frames: first frame near start, last near end
        assert raw[0][:, :20].min() < 250    # something drawn near x=5
        assert raw[-1][:, 40:].min() < 250   # and near x=50 at the end


class TestSession:
    def test_end_to_end(self):
        vae_cfg = wan_vae.WanVAEConfig(
            base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
            temperal_downsample=(True,), is_residual=False,
            scale_factor_temporal=2, scale_factor_spatial=2,
            latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
        dit_cfg = wan_dit.tiny_config(in_channels=8, out_channels=4)
        pipe = P.WanImageToVideoPipeline(
            dit_cfg, wan_dit.init_wan_dit(jax.random.key(0), dit_cfg),
            vae_cfg, wan_vae.init_wan_vae(jax.random.key(1), vae_cfg))

        sess = InteractiveSession(pipe, num_frames=9,
                                  num_inference_steps=2, guidance_scale=2.0)
        img = np.random.RandomState(0).randint(0, 255, (16, 16, 3)
                                               ).astype(np.uint8)
        spec = CanvasSpec(32, 64, 16, 16, 8, 8)
        sess.set_canvas(img, spec)
        sess.add_traj_point(40, 16)
        sess.add_traj_point(55, 20)
        text = jax.random.normal(jax.random.key(2),
                                 (1, 7, dit_cfg.text_dim))
        out = sess.run(text, id_image=img, key=jax.random.key(3),
                       attn_impl="xla")
        assert out.shape == (9, 16, 16, 3)
        assert out.dtype == np.uint8


def test_visualize_trajectories():
    from frameino_tpu.app.core import visualize_trajectories
    canvas = np.zeros((64, 96, 3), np.uint8)
    out = visualize_trajectories(canvas, [[(10, 10), (40, 30)],
                                          [(60, 50)]])
    assert out.shape == canvas.shape
    assert out.sum() > 0                       # something drawn
    assert canvas.sum() == 0                   # input untouched
    # two objects -> two distinct colors present
    colors = np.unique(out.reshape(-1, 3), axis=0)
    assert len(colors) >= 3                    # bg + 2 object colors


def test_segment_at_point_contracts():
    from frameino_tpu.app.core import segment_at_point
    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24] = 200

    def sam_style(image, points):
        x, y = int(points[0][0]), int(points[0][1])
        ref = image[y, x].astype(np.float32)
        return (np.abs(image.astype(np.float32) - ref).sum(-1) < 30)

    mask = segment_at_point(img, sam_style)        # center prompt
    assert mask[16, 16] == 1 and mask[0, 0] == 0

    def single_arg(image):
        return (image.sum(-1) > 100).astype(np.uint8)

    mask2 = segment_at_point(img, single_arg)
    assert mask2[16, 16] == 1


def test_round_dims_hint():
    from frameino_tpu.app.core import CanvasSpec
    assert CanvasSpec.round_dims(704, 1280) == (704, 1280, "")
    h, w, hint = CanvasSpec.round_dims(700, 1270)
    assert (h, w) == (704, 1280) and "rounded" in hint


def test_session_objects_lines_and_limit():
    """Multi-line objects share a color index; new_object errors past
    the palette limit (reference traj_instance_update/traj_point_update,
    app.py:424-486)."""
    from frameino_tpu.app.core import InteractiveSession
    from frameino_tpu.data.traj import ALL_COLOR_CODES
    s = InteractiveSession(pipeline=None)
    s.add_traj_point(1, 1)
    s.add_traj_point(2, 2)
    s.new_line()                       # same object, second line
    s.add_traj_point(5, 5)
    s.new_object()
    s.add_traj_point(9, 9)
    assert s.num_objects == 2
    assert s.line_obj == [0, 0, 1]
    # visualization colors by object: lines 0 and 1 share color 0
    canvas = np.zeros((16, 16, 3), np.uint8)
    from frameino_tpu.app.core import visualize_trajectories
    out = visualize_trajectories(canvas, s.polylines, dot_radius=1,
                                 object_ids=s.line_obj)
    c0 = tuple(int(v) for v in out[1, 1])
    c1 = tuple(int(v) for v in out[5, 5])
    c2 = tuple(int(v) for v in out[9, 9])
    assert c0 == c1 == ALL_COLOR_CODES[0]
    assert c2 == ALL_COLOR_CODES[1]
    # limit
    s.clear_traj_points()
    for _ in range(len(ALL_COLOR_CODES)):
        s.new_object()
    import pytest
    with pytest.raises(ValueError):
        s.new_object()


def test_color_legend_html():
    from frameino_tpu.app.core import color_legend_html
    from frameino_tpu.data.traj import ALL_COLOR_CODES
    assert color_legend_html(0) == ""
    html = color_legend_html(2)
    r, g, b = ALL_COLOR_CODES[0]
    assert f"rgb({r},{g},{b})" in html and "object 2" in html


def test_gradio_handlers_headless():
    """The exact event handlers the Gradio UI wires, exercised without
    gradio (VERDICT r2 #10): build (with x32 auto-round), click preview
    + legend, new object/line, clear, segment."""
    from frameino_tpu.app.core import InteractiveSession
    from frameino_tpu.app.gradio_app import make_handlers

    sess = InteractiveSession(pipeline=None,
                              segmenter=lambda img: (img.mean(-1) > 100))
    h = make_handlers(sess, text_encoder_fn=lambda p: None)
    img = np.full((16, 16, 3), 200, np.uint8)

    visual, h32, w32, hint = h["build"](img, 30, 60, 8, 8)
    assert (h32, w32) == (32, 64) and "rounded" in hint
    assert visual.shape == (32, 64, 3)

    canvas, legend = h["click"](10, 10)
    assert canvas.shape == (32, 64, 3) and "object 1" in legend
    msg, legend = h["new_object"]()
    assert "object" in msg
    h["click"](20, 20)
    msg, legend = h["new_line"]()
    assert sess.line_obj == [0, 1, 1]
    assert "object 2" in legend

    canvas, legend = h["clear"]()
    assert legend == "" and sess.polylines == []

    seg = h["segment"](img)
    assert seg is not None and seg.shape[-1] == 3
