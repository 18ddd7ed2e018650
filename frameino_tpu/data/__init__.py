from frameino_tpu.data.traj import (rasterize_trajectories,
                                    resample_track_by_length,
                                    ALL_COLOR_CODES)
from frameino_tpu.data.video_io import decode_video, write_video
from frameino_tpu.data.frameino_dataset import (FrameINODataset,
                                                FrameINODatasetConfig)
from frameino_tpu.data.frameino_dataset_old import FrameINODatasetOld
from frameino_tpu.data.motion_dataset import MotionDataset
from frameino_tpu.data.sampler import MixedBatchSampler
