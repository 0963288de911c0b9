from packnet_sfm_tpu.trainers.trainer import Trainer
