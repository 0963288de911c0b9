from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state, rank, world_size
from packnet_sfm_tpu.parallel.train_step import make_optimizer, make_train_step, make_eval_step, init_state, TrainState
