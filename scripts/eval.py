"""
Evaluation entry point (reference: scripts/core/eval.py:27-61).

Usage:
    python scripts/eval.py --checkpoint model.ckpt [--config cfg.yaml] [--half]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    parser = argparse.ArgumentParser(description='PackNet-SfM TPU evaluation')
    parser.add_argument('--checkpoint', type=str, required=True)
    parser.add_argument('--config', type=str, default=None,
                        help='optional YAML overriding the ckpt config')
    parser.add_argument('--half', action='store_true',
                        help='evaluate in bfloat16 (fp16-eval equivalent)')
    parser.add_argument('--int8', action='store_true',
                        help='fake-quantize outputs to uint8: measures the '
                             'INT8/NPU output-quantization metric cost')
    parser.add_argument('--int8-weights', action='store_true',
                        help='fake-quantize depth-net conv kernels '
                             '(per-channel symmetric int8): weight PTQ '
                             'measurement, or QAT validation after '
                             'model.params.qat training')
    parser.add_argument('--save_folder', default='',
                        help='dump per-sample outputs (depth npz/png, rgb, '
                             'viz) under this folder, per cfg.save.depth '
                             'flags (reference: utils/save.py)')
    parser.add_argument('--device', default='default',
                        choices=['default', 'cpu'], help="'cpu' forces the host CPU backend before jax initializes (the TPU plugin overrides JAX_PLATFORMS; backend init blocks while the device tunnel is down)")
    return parser.parse_args()


def test(ckpt_file, cfg_file=None, half=False, int8=False,
         save_folder='', int8_weights=False):
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.trainers.trainer import Trainer

    config, state = parse_test_file(ckpt_file, cfg_file)
    if save_folder:
        config.save.folder = save_folder
        config.save.pretrained = ckpt_file
    if half:
        config.tpu.compute_dtype = 'bfloat16'
    if int8:
        config.model.params.int8_outputs = True
    if int8_weights:
        config.model.params.int8_weights = True
    trainer = Trainer(config, resume_state=state)
    loader = trainer._make_loader('test')
    assert loader is not None, 'No test dataset configured'
    first = next(iter(loader))
    from packnet_sfm_tpu.trainers.trainer import _to_device_batch
    trainer._steps_per_epoch = 1
    trainer.setup(_to_device_batch(first, trainer.mesh))
    return trainer.test(loader)


if __name__ == '__main__':
    args = parse_args()
    if args.device == 'cpu':
        from packnet_sfm_tpu.utils.hostjax import force_cpu
        force_cpu()
    test(args.checkpoint, args.config, args.half, args.int8,
         args.save_folder, args.int8_weights)
