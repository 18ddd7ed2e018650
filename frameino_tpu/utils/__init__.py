from frameino_tpu.utils.optical_flow import (bivariate_gaussian,
                                             flow_to_image, filter_uv,
                                             make_colorwheel)
