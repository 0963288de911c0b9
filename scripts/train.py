"""
Training entry point (reference: scripts/core/train.py:29-76).

Usage:
    python scripts/train.py <config.yaml | checkpoint.ckpt> [key value ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    parser = argparse.ArgumentParser(description='PackNet-SfM TPU training')
    parser.add_argument('file', type=str,
                        help='YAML config or .ckpt checkpoint to resume')
    parser.add_argument('opts', nargs='*', default=[],
                        help='config overrides: key value ...')
    parser.add_argument('--device', default='default',
                        choices=['default', 'cpu'],
                        help="'cpu' forces the host CPU backend before jax initializes (the TPU plugin on this platform overrides JAX_PLATFORMS, and backend init blocks while the device tunnel is down)")
    args = parser.parse_args()
    assert args.file.endswith(('.ckpt', '.yaml', '.yml')) or \
        os.path.isdir(args.file), \
        'You need to provide a .yaml or .ckpt file'
    return args


def train(file, opts=None):
    from packnet_sfm_tpu.config import parse_train_file
    from packnet_sfm_tpu.trainers.trainer import Trainer
    from packnet_sfm_tpu.utils.logging_utils import print_config
    from packnet_sfm_tpu.loggers import setup_loggers

    config, resume_state = parse_train_file(file, opts)
    if config.debug:
        print_config(config)
    logger = setup_loggers(config)
    trainer = Trainer(config, resume_state=resume_state, logger=logger)
    trainer.fit()
    if logger is not None:
        logger.finish()


def _apply_device(device):
    if device == 'cpu':
        from packnet_sfm_tpu.utils.hostjax import force_cpu
        force_cpu()


if __name__ == '__main__':
    args = parse_args()
    _apply_device(args.device)
    train(args.file, args.opts)
