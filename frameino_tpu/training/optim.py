"""Optimizers + LR schedules matching the reference trainer recipe.

Reference ``train_code/train_wan_motion_FrameINO.py:401-487``
(get_optimizer: AdamW et al.) and ``config/train_wan_motion_FrameINO.yaml``
(lr 3e-5, betas (0.9, 0.999), weight_decay 1e-4, eps 1e-10,
constant_with_warmup 100). Grad clipping by global norm 1.0
(reference ``:1245-1247``) is applied in the train step via psum'd
global norm — the TPU equivalent of ``accelerator.clip_grad_norm_``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    optimizer: str = "adamw"
    learning_rate: float = 3e-5
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 1e-4
    epsilon: float = 1e-10
    lr_scheduler: str = "constant_with_warmup"
    lr_warmup_steps: int = 100
    max_train_steps: int = 10000
    max_grad_norm: float = 1.0
    # accelerator.accumulate analogue (reference trains with 2,
    # config/train_wan_motion_FrameINO.yaml:64)
    gradient_accumulation_steps: int = 1
    # skip optimizer updates when grads go NaN/inf (failure-detection
    # guard the reference lacks; resume-from-checkpoint is its only
    # recovery, SURVEY §5)
    skip_nonfinite_updates: bool = False
    max_consecutive_nonfinite: int = 10


def make_schedule(cfg: OptimizerConfig):
    if cfg.lr_scheduler == "constant_with_warmup":
        return optax.linear_schedule(0.0, cfg.learning_rate,
                                     cfg.lr_warmup_steps)
    if cfg.lr_scheduler == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.lr_warmup_steps,
            cfg.max_train_steps)
    raise ValueError(cfg.lr_scheduler)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    sched = make_schedule(cfg)
    if cfg.optimizer in ("adamw", "adam"):
        wd = cfg.weight_decay if cfg.optimizer == "adamw" else 0.0
        opt = optax.adamw(sched, b1=cfg.beta1, b2=cfg.beta2,
                          eps=cfg.epsilon, weight_decay=wd)
    elif cfg.optimizer == "adafactor":
        # the TPU counterpart of the reference's bitsandbytes AdamW8bit
        # memory-saving option (factored second moments instead of
        # quantized ones)
        opt = optax.adafactor(sched)
    elif cfg.optimizer == "prodigy":
        # parameter-free LR (reference get_optimizer's prodigy option,
        # train_code/train_wan_motion_FrameINO.py:455-487); lr acts as
        # the usual Prodigy multiplier (reference recommends 1.0)
        opt = optax.contrib.prodigy(
            learning_rate=cfg.learning_rate,
            betas=(cfg.beta1, cfg.beta2), eps=cfg.epsilon,
            weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f"unsupported optimizer {cfg.optimizer}")
    opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), opt)
    if cfg.skip_nonfinite_updates:
        opt = optax.apply_if_finite(opt, cfg.max_consecutive_nonfinite)
    if cfg.gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(
            opt, every_k_schedule=cfg.gradient_accumulation_steps)
    return opt
