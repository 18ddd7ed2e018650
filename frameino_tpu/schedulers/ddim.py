"""CogVideoX DDIM scheduler (v-prediction) — pure functions.

Reproduces diffusers' ``CogVideoXDDIMScheduler`` as configured by the
CogVideoX-5B checkpoints the reference finetunes
(``pipelines/pipeline_cogvideox_i2v_motion_FrameINO.py:30,914-926``):
scaled-linear betas 0.00085->0.012, SNR shift, zero-terminal-SNR rescale,
"trailing" timestep spacing, v-prediction, eta=0.

The alphas_cumprod table is host-side numpy (fp64) and baked into the
compiled denoise scan as constants.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    snr_shift_scale: float = 1.0
    rescale_betas_zero_snr: bool = True
    set_alpha_to_one: bool = True
    timestep_spacing: str = "trailing"
    prediction_type: str = "v_prediction"


def ddim_alphas_cumprod(cfg: DDIMConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                            cfg.num_train_timesteps, dtype=np.float64) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end,
                            cfg.num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(cfg.beta_schedule)
    ac = np.cumprod(1.0 - betas)
    # SNR shift (CogVideoX)
    ac = ac / (cfg.snr_shift_scale + (1 - cfg.snr_shift_scale) * ac)
    if cfg.rescale_betas_zero_snr:
        ac = _rescale_zero_terminal_snr(ac)
    return ac.astype(np.float64)


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    s = np.sqrt(alphas_cumprod)
    s0, sT = s[0], s[-1]
    s = s - sT
    s = s * s0 / (s0 - sT)
    return s ** 2


def inference_timesteps(cfg: DDIMConfig, num_inference_steps: int) -> np.ndarray:
    """'trailing' spacing: descending (N, N-step, ...) - 1."""
    if cfg.timestep_spacing == "trailing":
        step = cfg.num_train_timesteps / num_inference_steps
        t = np.round(np.arange(cfg.num_train_timesteps, 0, -step)) - 1
        return t.astype(np.int64)
    elif cfg.timestep_spacing == "linspace":
        return np.linspace(0, cfg.num_train_timesteps - 1,
                           num_inference_steps)[::-1].round().astype(np.int64)
    else:  # leading
        step = cfg.num_train_timesteps // num_inference_steps
        return (np.arange(num_inference_steps) * step).round()[::-1].astype(np.int64)


def _alpha_at(cfg: DDIMConfig, ac: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """alphas_cumprod[t] with t < 0 -> final_alpha (1.0 if set_alpha_to_one)."""
    final = 1.0 if cfg.set_alpha_to_one else ac[0]
    return jnp.where(t >= 0, ac[jnp.maximum(t, 0)], final)


def pred_x0_and_eps(cfg: DDIMConfig, sample, model_output, alpha_prod_t):
    """v-pred -> (x0, eps) (diffusers DDIM step, v_prediction branch)."""
    a = jnp.sqrt(alpha_prod_t)
    b = jnp.sqrt(1.0 - alpha_prod_t)
    if cfg.prediction_type == "v_prediction":
        x0 = a * sample - b * model_output
        eps = a * model_output + b * sample
    elif cfg.prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - b * eps) / a
    else:
        raise ValueError(cfg.prediction_type)
    return x0, eps


def ddim_step(cfg: DDIMConfig, ac: jnp.ndarray, sample: jnp.ndarray,
              model_output: jnp.ndarray, t: jnp.ndarray,
              num_inference_steps: int) -> jnp.ndarray:
    """CogVideoXDDIMScheduler.step (eta=0): the a_t/b_t update
    ``prev = a_t * sample + b_t * x0``."""
    prev_t = t - cfg.num_train_timesteps // num_inference_steps
    alpha_t = _alpha_at(cfg, ac, t)
    alpha_prev = _alpha_at(cfg, ac, prev_t)
    x0, _ = pred_x0_and_eps(cfg, sample.astype(jnp.float32),
                            model_output.astype(jnp.float32), alpha_t)
    a_t = jnp.sqrt((1.0 - alpha_prev) / (1.0 - alpha_t))
    b_t = jnp.sqrt(alpha_prev) - jnp.sqrt(alpha_t) * a_t
    prev = a_t * sample.astype(jnp.float32) + b_t * x0
    return prev.astype(sample.dtype)


def ddim_add_noise(ac: jnp.ndarray, x0: jnp.ndarray, noise: jnp.ndarray,
                   t: jnp.ndarray) -> jnp.ndarray:
    """sqrt(ac_t) x0 + sqrt(1-ac_t) eps, t: [B] int; broadcasts over dims."""
    a = jnp.sqrt(ac[t]).reshape((-1,) + (1,) * (x0.ndim - 1))
    b = jnp.sqrt(1.0 - ac[t]).reshape((-1,) + (1,) * (x0.ndim - 1))
    return a * x0 + b * noise


def get_velocity(ac: jnp.ndarray, x0: jnp.ndarray, noise: jnp.ndarray,
                 t: jnp.ndarray) -> jnp.ndarray:
    """v = sqrt(ac) eps - sqrt(1-ac) x0 (diffusers get_velocity; used as
    the training target, reference train_cogvideox_motion.py:1023)."""
    a = jnp.sqrt(ac[t]).reshape((-1,) + (1,) * (x0.ndim - 1))
    b = jnp.sqrt(1.0 - ac[t]).reshape((-1,) + (1,) * (x0.ndim - 1))
    return a * noise - b * x0
