from frameino_tpu.models import (cogvideox_dit, cogvideox_vae, t5_encoder,
                                 wan_dit, wan_vae, wan_vae_tiling, weights)
