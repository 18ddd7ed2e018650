from frameino_tpu.schedulers.flow_match_euler import (
    FlowMatchEulerConfig,
    flow_match_sigmas,
    inference_sigmas,
    euler_step,
    add_noise as flow_match_add_noise,
)
from frameino_tpu.schedulers.ddim import DDIMConfig, ddim_alphas_cumprod, ddim_step, ddim_add_noise, get_velocity
from frameino_tpu.schedulers.cogvideox_dpm import CogVideoXDPMConfig, dpm_step_pair
