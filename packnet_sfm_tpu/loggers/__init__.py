"""
Experiment loggers: TensorBoard + Weights & Biases, both optional
(reference: loggers/wandb_logger.py:18-120, loggers/tensorboard_logger.py:7,
wired at scripts/core/train.py:53-63 rank-0 only).
"""

from packnet_sfm_tpu.loggers.tensorboard_logger import TensorboardLogger
from packnet_sfm_tpu.loggers.wandb_logger import WandbLogger


def setup_loggers(config):
    """Build the first enabled logger (rank-0 only)."""
    import jax
    if jax.process_index() != 0:
        return None
    if not config.wandb.get('dry_run', True):
        logger = WandbLogger(
            name=config.wandb.name or config.name,
            project=config.wandb.project, entity=config.wandb.entity,
            tags=list(config.wandb.tags), dir=config.wandb.dir,
            config=config.to_dict(),
            mode=config.wandb.get('mode', ''))
        # stamp run identity into the config (checkpoints embed it —
        # reference: horovod_trainer.py:54-56)
        if logger.run_name:
            config.wandb.name = logger.run_name
            config.wandb.url = logger.run_url or ''
        return logger
    if not config.tensorboard.get('dry_run', True):
        return TensorboardLogger(
            log_dir=config.tensorboard.log_dir or 'runs',
            log_frequency=config.tensorboard.log_frequency)
    return None
