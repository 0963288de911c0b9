"""
Generate depth predictions through the TORCH MIRROR of a framework
checkpoint (reference: scripts/evaluation/generate_pytorch_predictions.py —
"predictions via the official pipeline" cross-check).

In this repo the roles are flipped: jax is the official pipeline and the
torch mirror (export/torch_mirror.py — the exact module the ONNX/TorchScript
exports trace) is the cross-framework witness. Dumps from this tool are
directly comparable with scripts/evaluation/generate_predictions.py output
via evaluate_unified.py --mode compare: agreement proves the export path
reproduces the framework's numbers on real images.

Supports ResNetSAN01-family checkpoints (single and dual head), the ones
the deployment flow exports.

Usage:
    python scripts/evaluation/generate_torch_predictions.py \
        --checkpoint m.ckpt --images rgb_dir --output preds_torch \
        [--split split.json] [--image_shape 384 640] [--save npz png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()

import numpy as np

from generate_predictions import resolve_split


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--split', default=None)
    p.add_argument('--images', required=True)
    p.add_argument('--output', required=True)
    p.add_argument('--image_shape', type=int, nargs=2, default=None)
    p.add_argument('--save', nargs='+', default=['npz'],
                   choices=['npz', 'png'])
    p.add_argument('--limit', type=int, default=0)
    args = p.parse_args(argv)

    import torch
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.datasets.io import load_image, write_depth
    from packnet_sfm_tpu.datasets.transforms import resize_image
    from packnet_sfm_tpu.export.torch_mirror import (
        load_resnet_san_into_torch)

    config, state = parse_test_file(args.checkpoint)
    net_name = config.model.depth_net.name
    if 'ResNetSAN' not in net_name:
        print('torch mirror supports ResNetSAN01-family checkpoints; '
              'got {}'.format(net_name), file=sys.stderr)
        return 2
    dual = bool(config.model.depth_net.get('use_dual_head', False))
    pc = config.model.params
    num_layers = int(str(config.model.depth_net.version or '18A')[:2])
    variables = {
        'params': state['params']['depth_net'],
        'batch_stats': state['batch_stats'].get('depth_net', {}),
    }
    net = load_resnet_san_into_torch(
        variables, num_layers=num_layers, dual_head=dual,
        min_depth=pc.min_depth or 0.5, max_depth=pc.max_depth or 80.0,
        use_log_space=bool(pc.use_log_space))
    net.eval()

    if args.split:
        files = resolve_split(args.split, args.images)
    else:
        files = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if f.lower().endswith(('.png', '.jpg', '.jpeg')))
    if args.limit:
        files = files[:args.limit]
    os.makedirs(args.output, exist_ok=True)

    with torch.no_grad():
        for f in files:
            rgb = load_image(f)
            if args.image_shape:
                rgb = resize_image(rgb, tuple(args.image_shape))
            stem = os.path.splitext(os.path.basename(f))[0]
            chw = torch.from_numpy(
                np.ascontiguousarray(rgb.transpose(2, 0, 1))[None])
            depth = net(chw).numpy()[0, 0]
            if 'npz' in args.save:
                write_depth(os.path.join(args.output, stem + '.npz'), depth)
            if 'png' in args.save:
                write_depth(os.path.join(args.output, stem + '.png'), depth)
            print('saved', stem)
    print('wrote {} torch-mirror predictions to {}'.format(
        len(files), args.output))
    return 0


if __name__ == '__main__':
    sys.exit(main())
