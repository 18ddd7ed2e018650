from frameino_tpu.models import (clip_vision, cogvideox_dit, cogvideox_vae,
                                 pretrained, quant, t5_encoder, wan_dit,
                                 wan_vae, wan_vae_tiling, weights)
