"""CogVideoX DPM-solver++ (2M) scheduler — pure functions.

Reproduces diffusers' ``CogVideoXDPMScheduler`` (v-prediction,
multistep with the previous step's x0 estimate threaded through the
loop) as used by the reference denoise loop
(``pipelines/pipeline_cogvideox_i2v_motion_FrameINO.py:915-926``):

    latents, old_x0 = step(noise_pred, old_x0, t, t_back, latents)

Deterministic path only (eta=0, the reference's default call).
Shares the alphas_cumprod table with the DDIM module.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from frameino_tpu.schedulers.ddim import (DDIMConfig, _alpha_at,
                                          pred_x0_and_eps)

# CogVideoXDPM shares the beta/alpha config with CogVideoXDDIM.
CogVideoXDPMConfig = DDIMConfig


def _lamb(alpha_prod):
    return jnp.log(jnp.sqrt(alpha_prod) / jnp.sqrt(1.0 - alpha_prod))


def dpm_step_pair(cfg: DDIMConfig, ac: jnp.ndarray,
                  sample: jnp.ndarray, model_output: jnp.ndarray,
                  t: jnp.ndarray, t_back: Optional[jnp.ndarray],
                  old_x0: Optional[jnp.ndarray],
                  num_inference_steps: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DPM-solver++(2M) step. Returns (prev_sample, x0_estimate).

    First call (t_back/old_x0 None): first-order (DPM-Solver++1) update.
    Subsequent: second-order multistep using the previous x0 estimate.
    """
    sample32 = sample.astype(jnp.float32)
    out32 = model_output.astype(jnp.float32)

    prev_t = t - cfg.num_train_timesteps // num_inference_steps
    alpha_t = _alpha_at(cfg, ac, t)
    alpha_prev = _alpha_at(cfg, ac, prev_t)

    x0, _ = pred_x0_and_eps(cfg, sample32, out32, alpha_t)

    lam = _lamb(alpha_t)
    lam_next = _lamb(alpha_prev)
    h = lam_next - lam

    sigma_t = jnp.sqrt(1.0 - alpha_t)
    sigma_next = jnp.sqrt(1.0 - alpha_prev)
    a_next = jnp.sqrt(alpha_prev)

    # DPM-Solver++ deterministic update:
    #   x_next = (sigma_next / sigma_t) * x - a_next * (exp(-h) - 1) * D
    mult0 = sigma_next / sigma_t
    mult1 = a_next * jnp.expm1(-h)

    # Second order only when a previous estimate exists AND this is not
    # the final step (diffusers returns the first-order result when
    # ``prev_timestep < 0``, which also avoids inf/NaN from lambda(1)=inf).
    if t_back is None or old_x0 is None:
        denoised = x0
    else:
        # t_back < 0 is the "no previous step" sentinel used by compiled
        # scan loops (None is not traceable)
        use_second = (prev_t >= 0) & (t_back >= 0)
        alpha_back = _alpha_at(cfg, ac, t_back)
        h_last = lam - _lamb(alpha_back)
        # NaN-safe: replace h by 1 where second order is disabled so the
        # division never produces inf that would leak through the select.
        h_safe = jnp.where(use_second, h, 1.0)
        r = h_last / h_safe
        r = jnp.where(use_second & (r != 0), r, 1.0)
        second = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * old_x0
        denoised = jnp.where(use_second, second, x0)

    prev = mult0 * sample32 - mult1 * denoised
    return prev.astype(sample.dtype), x0
