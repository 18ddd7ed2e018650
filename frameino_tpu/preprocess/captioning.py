"""Step 6: structured captioning (reference
``preprocess/caption_qwen_multi.py``: Qwen2.5-VL-32B structured text
prompts -> ``Structured_Text_Prompt``). The VLM is pluggable (a serving
endpoint or a local HF pipeline); a deterministic template fallback
keeps the CSV pipeline runnable offline."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

PROMPT_TEMPLATE = (
    "Describe the video in one structured sentence: the main subject, "
    "its motion, and the scene.")


def template_captioner(frames: np.ndarray) -> str:
    return "a subject moves through the scene"


def caption_step(frames: np.ndarray,
                 vlm: Optional[Callable] = None,
                 timeout_s: float = 60.0) -> str:
    """vlm(frames, prompt) -> str. The reference guards each call with a
    SIGALRM timeout (``caption_qwen_multi.py:7-9``); here a soft wall
    clock check wraps the pluggable callable."""
    import time
    fn = vlm or (lambda f, p: template_captioner(f))
    t0 = time.time()
    caption = fn(frames, PROMPT_TEMPLATE)
    if time.time() - t0 > timeout_s:
        raise TimeoutError("captioner exceeded the step budget")
    return str(caption)
