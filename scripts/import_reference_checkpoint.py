"""
Convert a reference (torch) packnet-sfm checkpoint into a framework-native
checkpoint.

A user of the reference trains with its torch stack and ends up with a
`.ckpt` holding {'config': <yacs CfgNode>, 'state_dict': {'model.depth_net.*',
'model.pose_net.*', ...}} (reference models/model_checkpoint.py +
utils/load.py naming). This tool ingests that file, maps the weights onto our
flax trees (export/torch_import.py), and writes a checkpoint that
scripts/eval.py / scripts/infer.py / scripts/train.py consume directly:

    python scripts/import_reference_checkpoint.py \
        --checkpoint reference_model.ckpt --output converted.ckpt \
        [--config override.yaml]

Supported depth nets: ResNetSAN01 (+FiLM/dual-head), PackNet01,
PackNetSlim01, PackNetSAN01, PackNetSlimSAN01. Pose nets: PoseNet,
PoseResNet. The reference config rides along (our config system is
yacs-key-compatible); `--config` merges a YAML on top, e.g. to point
datasets at local paths. The output has no optimizer state — training
resume starts with a fresh optimizer (fine for fine-tuning).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser(
        description='reference torch .ckpt -> framework checkpoint')
    p.add_argument('--checkpoint', required=True,
                   help='reference torch .ckpt (or bare state_dict .pth)')
    p.add_argument('--output', required=True, help='output .ckpt path')
    p.add_argument('--config', default=None,
                   help='YAML merged over the checkpoint config (e.g. '
                        'local dataset paths); required if the checkpoint '
                        'carries no config')
    p.add_argument('--me_kernel_order', default='first_axis_fastest',
                   choices=['first_axis_fastest', 'last_axis_fastest'],
                   help='MinkowskiEngine kernel-offset enumeration order '
                        'of the source checkpoint')
    p.add_argument('--device', default='cpu',
                   choices=['default', 'cpu'],
                   help='conversion runs fine on CPU (default)')
    return p.parse_args()


from packnet_sfm_tpu.export.reference_convert import (  # noqa: E402,F401
    _dummy_batch, _install_yacs_stub, _plain_dict, convert)


if __name__ == '__main__':
    args = parse_args()
    if args.device == 'cpu':
        from packnet_sfm_tpu.utils.hostjax import force_cpu
        force_cpu()
    convert(args.checkpoint, args.output, args.config,
            args.me_kernel_order)
