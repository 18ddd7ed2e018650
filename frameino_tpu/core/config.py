"""YAML experiment configuration.

Counterpart of the reference's OmegaConf flat-YAML configs
(``config/train_wan_motion_FrameINO.yaml``, loaded at
``train_code/train_wan_motion_FrameINO.py:1338-1342`` and read as a flat
dict). Plain PyYAML here; ``filter_kwargs`` adapts YAML subtrees to
dataclass signatures like the reference's helper (``:94-99``).
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import Any, Dict

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def filter_kwargs(cls, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Keep only keys that ``cls.__init__`` (or dataclass fields) accept."""
    if dataclasses.is_dataclass(cls):
        names = {f.name for f in dataclasses.fields(cls)}
    else:
        names = set(inspect.signature(cls).parameters)
    return {k: v for k, v in kwargs.items() if k in names}


def make_dataclass_from_config(cls, config: Dict[str, Any], **overrides):
    kw = filter_kwargs(cls, config)
    kw.update(overrides)
    return cls(**kw)
