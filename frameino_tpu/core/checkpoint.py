"""Orbax checkpointing: save/resume with rolling retention.

TPU-native counterpart of the reference's accelerate checkpoint flow
(``train_code/train_wan_motion_FrameINO.py:872-897`` save/load hooks,
``:1070-1096`` resume-from-latest scan, ``:1296-1321`` rolling
``checkpoints_total_limit`` GC). Checkpoints carry (params, opt_state,
step) plus a JSON metadata blob (e.g. data-iterator epoch/offset) so
training resumes deterministically.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


_STEP_RE = re.compile(r"^checkpoint-(\d+)$")


def _ckpt_dirs(root: str):
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _STEP_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(root, name)))
    return sorted(out)


def latest_checkpoint(root: str) -> Optional[str]:
    dirs = _ckpt_dirs(root)
    return dirs[-1][1] if dirs else None


def save_checkpoint(root: str, step: int, state,
                    metadata: Optional[Dict[str, Any]] = None,
                    total_limit: Optional[int] = None) -> str:
    """Write checkpoint-{step}/ under root; prune to total_limit."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"checkpoint-{step}")
    if os.path.exists(path):
        # idempotent re-save at the same step (e.g. final save landing on
        # a periodic-save step)
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(path, "state")),
               {"params": state.params, "opt_state": state.opt_state,
                "step": state.step})
    ckptr.wait_until_finished()
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(metadata or {}, f)

    if total_limit is not None:
        dirs = _ckpt_dirs(root)
        while len(dirs) > total_limit:
            _, victim = dirs.pop(0)
            shutil.rmtree(victim)
    return path


def restore_checkpoint(path: str, abstract_state) -> Tuple[Any, Dict]:
    """Restore into the structure/shardings of ``abstract_state``
    (a TrainState template, e.g. from init or eval_shape)."""
    ckptr = ocp.StandardCheckpointer()
    target = {"params": abstract_state.params,
              "opt_state": abstract_state.opt_state,
              "step": abstract_state.step}
    restored = ckptr.restore(os.path.abspath(os.path.join(path, "state")),
                             target)
    meta_path = os.path.join(path, "metadata.json")
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    state = type(abstract_state)(params=restored["params"],
                                 opt_state=restored["opt_state"],
                                 step=restored["step"])
    return state, metadata
