"""
NCDB-specific inference: run a checkpoint over an NCDB split and save
depth maps + visualizations (reference: scripts/core/infer_ncdb.py role).

Usage:
    python scripts/infer_ncdb.py --checkpoint m.ckpt --root /data/ncdb
        --split splits/val.json --output out/ [--image_shape 384 640]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--root', required=True)
    p.add_argument('--split', required=True)
    p.add_argument('--output', required=True)
    p.add_argument('--image_shape', type=int, nargs=2, default=[384, 640])
    p.add_argument('--save', nargs='+', default=['npz', 'viz'],
                   choices=['npz', 'png', 'viz'])
    p.add_argument('--device', default='default',
                   choices=['default', 'cpu'], help="'cpu' forces the host CPU backend before jax initializes (the TPU plugin overrides JAX_PLATFORMS; backend init blocks while the device tunnel is down)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.datasets.ncdb import NcdbDataset
    from packnet_sfm_tpu.datasets.transforms import get_transforms
    from packnet_sfm_tpu.datasets.io import write_depth, write_image
    from packnet_sfm_tpu.ops.depth import (
        sigmoid_to_inv_depth, inv2depth, dual_head_to_depth)
    from packnet_sfm_tpu.utils.viz import viz_inv_depth

    config, state = parse_test_file(args.checkpoint)
    params_cfg = config.model.params
    model = setup_model(config)
    variables = {
        'params': jax.tree_util.tree_map(jnp.asarray, state['params']),
        'batch_stats': jax.tree_util.tree_map(jnp.asarray,
                                              state['batch_stats'])}

    tf = get_transforms('test', image_shape=tuple(args.image_shape))
    ds = NcdbDataset(path=args.root, split=args.split, transform=tf,
                     strict_depth=False)
    os.makedirs(args.output, exist_ok=True)

    @jax.jit
    def forward(rgb):
        return model.apply(variables, {'rgb': rgb}, train=False)

    dual = config.model.depth_net.get('use_dual_head', False)
    for i in range(len(ds)):
        s = ds[i]
        out = forward(jnp.asarray(s['rgb'][None]))
        if dual:
            depth = np.asarray(dual_head_to_depth(
                out[('integer', 0)], out[('fractional', 0)],
                params_cfg.max_depth))[0, ..., 0]
            inv = 1.0 / np.maximum(depth, 1e-6)
        else:
            sig = out['inv_depths'][0]
            inv = np.asarray(sigmoid_to_inv_depth(
                sig, params_cfg.min_depth or 0.5,
                params_cfg.max_depth or 15.0,
                params_cfg.use_log_space))[0, ..., 0]
            depth = np.asarray(inv2depth(jnp.asarray(inv)))
        stem = s['filename']
        if 'npz' in args.save:
            write_depth(os.path.join(args.output, stem + '.npz'), depth)
        if 'png' in args.save:
            write_depth(os.path.join(args.output, stem + '.png'), depth)
        if 'viz' in args.save:
            write_image(os.path.join(args.output, stem + '_viz.png'),
                        viz_inv_depth(inv))
        if i % 50 == 0:
            print('{}/{}'.format(i, len(ds)))
    print('done:', len(ds), 'images')


if __name__ == '__main__':
    main()
