from frameino_tpu.training.noise_sampler import stratified_timestep_indices
from frameino_tpu.training.optim import make_optimizer, OptimizerConfig
from frameino_tpu.training.trainer import (TrainState, TrainerConfig,
                                           make_train_step, init_train_state,
                                           make_sharded_train_state,
                                           encode_training_batch, wan_fm_loss)
