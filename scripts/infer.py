"""
Inference entry point: single image or folder -> depth npz/png/viz
(reference: scripts/core/infer.py:52-120).

Usage:
    python scripts/infer.py --checkpoint model.ckpt --input img_or_dir
                            --output out_dir [--image_shape H W] [--save npz png viz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description='PackNet-SfM TPU inference')
    parser.add_argument('--checkpoint', type=str, required=True)
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--image_shape', type=int, nargs=2, default=None)
    parser.add_argument('--save', type=str, nargs='+',
                        default=['npz', 'viz'], choices=['npz', 'png', 'viz'])
    parser.add_argument('--mask', type=str, default=None,
                        help='optional binary mask multiplied into the input')
    parser.add_argument('--colormap', default='plasma',
                        choices=('plasma', 'depth'),
                        help="viz colormap: 'plasma' = normalized "
                             "inverse-depth (default); 'depth' = the "
                             "reference's metric red=near->blue=far map "
                             "(reference: visualization/colormaps.py)")
    parser.add_argument('--device', default='default',
                        choices=['default', 'cpu'], help="'cpu' forces the host CPU backend before jax initializes (the TPU plugin overrides JAX_PLATFORMS; backend init blocks while the device tunnel is down)")
    return parser.parse_args()


def infer_and_save_depth(ckpt_file, input_path, output_path,
                         image_shape=None, save=('npz', 'viz'), mask=None,
                         colormap='plasma'):
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.datasets.io import load_image, write_depth, write_image
    from packnet_sfm_tpu.datasets.transforms import resize_image
    from packnet_sfm_tpu.ops.depth import (
        sigmoid_to_inv_depth, inv2depth, dual_head_to_depth)
    from packnet_sfm_tpu.utils.viz import viz_inv_depth, viz_depth_metric

    config, state = parse_test_file(ckpt_file)
    model = setup_model(config)
    params = jax.tree_util.tree_map(jnp.asarray, state['params'])
    batch_stats = jax.tree_util.tree_map(jnp.asarray, state['batch_stats'])

    if os.path.isdir(input_path):
        files = sorted(
            os.path.join(input_path, f) for f in os.listdir(input_path)
            if f.lower().endswith(('.png', '.jpg', '.jpeg')))
    else:
        files = [input_path]
    os.makedirs(output_path, exist_ok=True)

    mask_img = None
    if mask:
        mask_img = (load_image(mask).mean(-1, keepdims=True) > 0
                    ).astype(np.float32)

    dual = bool(config.model.depth_net.get('use_dual_head', False))

    @jax.jit
    def forward(rgb):
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          {'rgb': rgb}, train=False)
        if dual:
            return out[('integer', 0)], out[('fractional', 0)]
        return out['inv_depths'][0]

    params_cfg = config.model.params
    for f in files:
        rgb = load_image(f)
        if image_shape:
            rgb = resize_image(rgb, tuple(image_shape))
        if mask_img is not None:
            m = mask_img
            if m.shape[:2] != rgb.shape[:2]:
                m = resize_image(np.repeat(m, 3, -1), rgb.shape[:2])[..., :1]
            rgb = rgb * (m > 0)
        out = forward(jnp.asarray(rgb[None]))
        if dual:
            integer, frac = out
            depth = np.asarray(dual_head_to_depth(
                integer, frac, params_cfg.max_depth or 80.0))[0, ..., 0]
            inv_depth = 1.0 / np.maximum(depth[..., None], 1e-6)
        else:
            sig = np.asarray(out)[0]
            inv_depth = sigmoid_to_inv_depth(
                jnp.asarray(sig), params_cfg.min_depth or 0.5,
                params_cfg.max_depth or 80.0,
                params_cfg.use_log_space)
            depth = np.asarray(inv2depth(inv_depth))[..., 0]
        base = os.path.splitext(os.path.basename(f))[0]
        if 'npz' in save:
            write_depth(os.path.join(output_path, base + '.npz'), depth)
        if 'png' in save:
            write_depth(os.path.join(output_path, base + '.png'), depth)
        if 'viz' in save:
            if colormap == 'depth':
                viz = viz_depth_metric(depth, params_cfg.min_depth or 0.5,
                                       params_cfg.max_depth or 80.0)
            else:
                viz = viz_inv_depth(np.asarray(inv_depth)[..., 0])
            write_image(os.path.join(output_path, base + '_viz.png'), viz)
        print('saved', base)


if __name__ == '__main__':
    args = parse_args()
    if args.device == 'cpu':
        from packnet_sfm_tpu.utils.hostjax import force_cpu
        force_cpu()
    infer_and_save_depth(args.checkpoint, args.input, args.output,
                         args.image_shape, args.save, args.mask,
                         args.colormap)
