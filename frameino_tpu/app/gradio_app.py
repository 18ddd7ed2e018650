"""Gradio front end for the FrameINO interactive demo.

Counterpart of the reference ``app.py`` UI (canvas builder, per-object
trajectory clicks, SAM ID segmentation, generation). Requires ``gradio``
(not part of the baked TPU image) — the UI import is gated so the rest
of the app package stays importable.
"""

from __future__ import annotations

import numpy as np

from frameino_tpu.app.core import (CanvasSpec, InteractiveSession,
                                   prepare_id_reference, segment_at_point,
                                   visualize_trajectories)


def launch(pipeline, text_encoder_fn, segmenter=None, **launch_kwargs):
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is required for the demo UI: pip install gradio; the "
            "UI-free InteractiveSession in frameino_tpu.app.core exposes "
            "the same functionality programmatically") from e

    session = InteractiveSession(pipeline, segmenter=segmenter)

    with gr.Blocks(title="FrameINO-TPU") as demo:
        gr.Markdown("## Frame In-N-Out — TPU-native demo")
        with gr.Row():
            image_in = gr.Image(label="Input image", type="numpy")
            canvas_view = gr.Image(label="Canvas (click to add trajectory)")
        with gr.Row():
            canvas_h = gr.Number(value=704, label="Canvas height (x32)")
            canvas_w = gr.Number(value=1280, label="Canvas width (x32)")
            off_x = gr.Number(value=0, label="Image offset x")
            off_y = gr.Number(value=0, label="Image offset y")
        prompt = gr.Textbox(label="Prompt")
        with gr.Row():
            id_image = gr.Image(label="ID reference (optional; click to "
                                      "point-prompt the segmenter)",
                                type="numpy")
            id_preview = gr.Image(label="Segmented ID (background-zeroed)")
        new_obj = gr.Checkbox(label="Next click starts a new object")
        build_btn = gr.Button("Build canvas")
        clear_btn = gr.Button("Clear trajectories")
        segment_btn = gr.Button("Segment ID (center prompt)")
        run_btn = gr.Button("Generate")
        video_out = gr.Video(label="Result")
        state = {"visual": None, "id_mask": None}

        def on_build(img, ch, cw, ox, oy):
            spec = CanvasSpec(int(ch), int(cw), img.shape[0], img.shape[1],
                              int(ox), int(oy))
            visual = session.set_canvas(img, spec)
            state["visual"] = visual
            return visual

        def on_click(evt: "gr.SelectData", new_object):
            # realtime per-object colored polyline preview
            # (reference fn_vis_realtime_traj, app.py:401-422)
            session.add_traj_point(evt.index[0], evt.index[1],
                                   new_object=bool(new_object))
            base = state["visual"] if state["visual"] is not None \
                else session.inference_canvas
            return visualize_trajectories(base, session.polylines)

        def on_clear():
            session.clear_traj_points()
            return state["visual"]

        def on_segment(id_img, evt: "gr.SelectData" = None):
            if id_img is None or session.segmenter is None:
                state["id_mask"] = None
                return None
            point = tuple(evt.index) if evt is not None else None
            mask = segment_at_point(id_img, session.segmenter, point)
            state["id_mask"] = mask
            spec = session.spec
            return prepare_id_reference(
                id_img, mask,
                spec.canvas_height if spec else id_img.shape[0],
                spec.canvas_width if spec else id_img.shape[1])

        def on_run(prompt_text, id_img):
            import tempfile
            from frameino_tpu.data.video_io import write_video
            embeds = text_encoder_fn([prompt_text])
            frames = session.run(embeds, id_image=id_img,
                                 id_mask=state["id_mask"])
            path = tempfile.mktemp(suffix=".mp4")
            write_video(path, frames)
            return path

        build_btn.click(on_build, [image_in, canvas_h, canvas_w, off_x,
                                   off_y], canvas_view)
        canvas_view.select(on_click, [new_obj], canvas_view)
        clear_btn.click(on_clear, [], canvas_view)
        segment_btn.click(on_segment, [id_image], id_preview)
        id_image.select(on_segment, [id_image], id_preview)
        run_btn.click(on_run, [prompt, id_image], video_out)

    demo.launch(**launch_kwargs)
    return demo
