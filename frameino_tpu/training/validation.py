"""In-training validation: run the full pipeline on validation samples.

Reference ``train_code/train_wan_motion_FrameINO.py:165-299``
(log_validation): every ``validation_step`` steps each rank runs the
full FrameINO inference pipeline on one validation sample and dumps the
condition visualizations + generated video;
``first_iter_validation: true`` smoke-tests the whole stack at step 0.

Under pjit there are no per-rank processes; samples are taken
round-robin from the validation set per host process
(``jax.process_index()``-offset, the TPU analogue of the reference's
rank sharding at ``:195``).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import numpy as np


def log_validation(pipeline, dataset, embed_prompts: Callable,
                   step: int, output_folder: str,
                   num_inference_steps: int = 38,
                   guidance_scale: float = 5.0,
                   sample_offset: int = 0,
                   attn_impl: Optional[str] = None) -> str:
    """Generate one validation video + condition dumps; returns the dir."""
    import jax.numpy as jnp
    from frameino_tpu.data.video_io import write_video

    idx = (jax.process_index() + sample_offset) % len(dataset)
    item = dataset[idx]
    out_dir = os.path.join(output_folder, f"validation_step{step}")
    os.makedirs(out_dir, exist_ok=True)

    F, _, H, W = item["video_tensor"].shape
    embeds = embed_prompts([item["text_prompt"]])
    video = pipeline(
        jnp.asarray(item["first_frame_tensor"])[None],
        prompt_embeds=embeds,
        traj_tensor=jnp.asarray(item["traj_tensor"]),
        id_tensor=jnp.asarray(item["ID_tensor"])[None, :, None],
        height=H, width=W, num_frames=F,
        num_inference_steps=num_inference_steps,
        guidance_scale=guidance_scale,
        key=jax.random.key(step), attn_impl=attn_impl)
    gen = ((np.asarray(video)[0].transpose(1, 2, 3, 0) + 1) / 2 * 255
           ).clip(0, 255).astype(np.uint8)

    write_video(os.path.join(out_dir, "generated.mp4"), gen)
    write_video(os.path.join(out_dir, "gt.mp4"), item["video_gt_np"])
    write_video(os.path.join(out_dir, "traj_condition.mp4"),
                item["traj_imgs_np"])
    if item.get("merge_frames") is not None:
        write_video(os.path.join(out_dir, "merged_conditions.mp4"),
                    item["merge_frames"])
    import cv2
    cv2.imwrite(os.path.join(out_dir, "first_frame_canvas.png"),
                cv2.cvtColor(item["first_frame_np"], cv2.COLOR_RGB2BGR))
    cv2.imwrite(os.path.join(out_dir, "id_reference.png"),
                cv2.cvtColor(item["ID_np"], cv2.COLOR_RGB2BGR))
    with open(os.path.join(out_dir, "prompt.txt"), "w") as f:
        f.write(item["text_prompt"])
    return out_dir
