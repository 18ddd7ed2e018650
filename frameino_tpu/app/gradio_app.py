"""Gradio front end for the FrameINO interactive demo.

Counterpart of the reference ``app.py`` UI (canvas builder, per-object
trajectory clicks, SAM ID segmentation, generation). Requires ``gradio``
(not part of the baked TPU image) — the UI import is gated so the rest
of the app package stays importable.
"""

from __future__ import annotations

import numpy as np

from frameino_tpu.app.core import CanvasSpec, InteractiveSession


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
        id_image = gr.Image(label="ID reference (optional)", type="numpy")
        new_obj = gr.Checkbox(label="Next click starts a new object")
        build_btn = gr.Button("Build canvas")
        clear_btn = gr.Button("Clear trajectories")
        run_btn = gr.Button("Generate")
        video_out = gr.Video(label="Result")

        def on_build(img, ch, cw, ox, oy):
            spec = CanvasSpec(int(ch), int(cw), img.shape[0], img.shape[1],
                              int(ox), int(oy))
            return session.set_canvas(img, spec)

        def on_click(evt: "gr.SelectData", new_object):
            session.add_traj_point(evt.index[0], evt.index[1],
                                   new_object=bool(new_object))
            canvas = session.inference_canvas.copy()
            for line in session.polylines:
                for (x, y) in line:
                    canvas[max(0, int(y) - 3):int(y) + 3,
                           max(0, int(x) - 3):int(x) + 3] = (255, 0, 0)
            return canvas

        def on_run(prompt_text, id_img):
            import tempfile
            from frameino_tpu.data.video_io import write_video
            embeds = text_encoder_fn([prompt_text])
            frames = session.run(embeds, id_image=id_img)
            path = tempfile.mktemp(suffix=".mp4")
            write_video(path, frames)
            return path

        build_btn.click(on_build, [image_in, canvas_h, canvas_w, off_x,
                                   off_y], canvas_view)
        canvas_view.select(on_click, [new_obj], canvas_view)
        clear_btn.click(lambda: session.clear_traj_points(), [], [])
        run_btn.click(on_run, [prompt, id_image], video_out)

    demo.launch(**launch_kwargs)
    return demo
