from frameino_tpu.evaluation.metrics import (traj_error_from_tracks,
                                             vseg_mae_from_masks,
                                             relative_dino_from_sims,
                                             vlm_success_rate,
                                             region_scaled_canvas,
                                             cosine_similarity)
from frameino_tpu.evaluation.mass_evaluation import (mass_evaluation,
                                                     FRAME_IN_METRICS,
                                                     FRAME_OUT_METRICS)
from frameino_tpu.evaluation.artifacts import (write_instance_artifacts,
                                               read_instance_frames)
