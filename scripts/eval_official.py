"""
Official evaluation entry point with split selection
(reference: scripts/core/eval_official.py:33-80).

Usage:
    python scripts/eval_official.py --checkpoint m.ckpt --split val|test
                                    [--config cfg.yaml] [--half]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--config', default=None)
    p.add_argument('--split', choices=['val', 'test'], default='test')
    p.add_argument('--half', action='store_true')
    p.add_argument('--device', default='default',
                   choices=['default', 'cpu'], help="'cpu' forces the host CPU backend before jax initializes (the TPU plugin overrides JAX_PLATFORMS; backend init blocks while the device tunnel is down)")
    return p.parse_args()


def evaluate(ckpt, cfg_file=None, split='test', half=False):
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.trainers.trainer import Trainer, _to_device_batch

    config, state = parse_test_file(ckpt, cfg_file)
    if half:
        config.tpu.compute_dtype = 'bfloat16'
    trainer = Trainer(config, resume_state=state)
    loader = trainer._make_loader(
        'validation' if split == 'val' else 'test')
    assert loader is not None, 'No {} dataset configured'.format(split)
    first = next(iter(loader))
    trainer._steps_per_epoch = 1
    trainer.setup(_to_device_batch(first, trainer.mesh))
    metrics = trainer.validate(loader)
    return metrics


if __name__ == '__main__':
    args = parse_args()
    if args.device == 'cpu':
        from packnet_sfm_tpu.utils.hostjax import force_cpu
        force_cpu()
    evaluate(args.checkpoint, args.config, args.split, args.half)
