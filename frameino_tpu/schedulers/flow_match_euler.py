"""FlowMatch Euler discrete scheduler — pure functions for lax.scan.

Reproduces the diffusers ``FlowMatchEulerDiscreteScheduler`` recipe the
reference configures for Wan (``config/train_wan_motion_FrameINO.yaml:43-50``:
num_train_timesteps=1000, shift=5.0, use_dynamic_shifting=false) and uses
in the pipeline denoise loop
(``pipelines/pipeline_wan_i2v_motion_FrameINO.py:762, 891``).

Conventions (flow matching, x_0 = clean, x_1 = noise):
    x_sigma = (1 - sigma) * x0 + sigma * eps
    model target (reference train_wan_motion_FrameINO.py:1231): eps - x0
    Euler step: x_{next} = x + (sigma_next - sigma) * v_pred
    timestep value fed to the DiT = sigma * num_train_timesteps
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerConfig:
    num_train_timesteps: int = 1000
    shift: float = 5.0
    use_dynamic_shifting: bool = False
    base_shift: float = 0.5
    max_shift: float = 1.15
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096


def _shift_sigmas(cfg: FlowMatchEulerConfig, sigmas: np.ndarray,
                  mu: float | None = None) -> np.ndarray:
    if cfg.use_dynamic_shifting:
        if mu is None:
            raise ValueError("dynamic shifting requires mu")
        return np.exp(mu) / (np.exp(mu) + (1 / sigmas - 1))
    return cfg.shift * sigmas / (1 + (cfg.shift - 1) * sigmas)


def dynamic_mu(cfg: FlowMatchEulerConfig, image_seq_len: int) -> float:
    """diffusers calculate_shift: linear mu(seq_len)."""
    m = (cfg.max_shift - cfg.base_shift) / (cfg.max_image_seq_len - cfg.base_image_seq_len)
    b = cfg.base_shift - m * cfg.base_image_seq_len
    return image_seq_len * m + b


def flow_match_sigmas(cfg: FlowMatchEulerConfig) -> np.ndarray:
    """Training sigma table, index i == training timestep index.

    sigmas[i] corresponds to timestep (i+1)/N shifted; descending i=0 is
    t=N (pure noise) ... matching the diffusers constructor's
    ``timesteps = linspace(1, N, N)[::-1]``.
    """
    t = np.linspace(1, cfg.num_train_timesteps, cfg.num_train_timesteps,
                    dtype=np.float64)[::-1].copy()
    sigmas = t / cfg.num_train_timesteps
    sigmas = _shift_sigmas(cfg, sigmas)
    return sigmas.astype(np.float32)


def inference_sigmas(cfg: FlowMatchEulerConfig, num_inference_steps: int,
                     mu: float | None = None) -> tuple[np.ndarray, np.ndarray]:
    """(sigmas[steps+1] incl. trailing 0, timesteps[steps]).

    Matches diffusers set_timesteps: linspace from sigma_max*N down to
    sigma_min*N over `steps`, /N, shifted, with a trailing 0 sigma.
    """
    base = np.linspace(1, cfg.num_train_timesteps, cfg.num_train_timesteps,
                       dtype=np.float64)[::-1] / cfg.num_train_timesteps
    sigma_max, sigma_min = float(base[0]), float(base[-1])
    t = np.linspace(sigma_max * cfg.num_train_timesteps,
                    sigma_min * cfg.num_train_timesteps,
                    num_inference_steps, dtype=np.float64)
    sigmas = t / cfg.num_train_timesteps
    sigmas = _shift_sigmas(cfg, sigmas, mu)
    timesteps = (sigmas * cfg.num_train_timesteps).astype(np.float32)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return sigmas, timesteps


def add_noise(x0: jnp.ndarray, noise: jnp.ndarray, sigma) -> jnp.ndarray:
    """scale_noise: sigma*noise + (1-sigma)*x0. sigma broadcastable."""
    return sigma * noise + (1.0 - sigma) * x0


def euler_step(latents: jnp.ndarray, model_output: jnp.ndarray,
               sigma, sigma_next) -> jnp.ndarray:
    """One FlowMatch Euler step (diffusers ``step``), fp32 math."""
    l32 = latents.astype(jnp.float32)
    out = l32 + (sigma_next - sigma) * model_output.astype(jnp.float32)
    return out.astype(latents.dtype)
