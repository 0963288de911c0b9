"""
Depth visualization: RGB | predicted inverse-depth colormap | optional GT
overlay panel, saved side-by-side (reference:
scripts/visualization/visualize_depth.py,
visualize_with_inverse_depth_and_gt_overlay.py).

Inputs are precomputed predictions (npz/npy/png) OR a checkpoint to run
inference with. GT overlay scatters valid GT pixels over the prediction so
sparse-lidar alignment errors are visible.

Usage:
    python scripts/visualization/visualize_depth.py \
        --image img.png [--pred pred.npz | --checkpoint m.ckpt] \
        [--gt gt.png] --output out.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()  # offline host tool: never contend for the TPU tunnel

import numpy as np
from PIL import Image


def load_depth_any(path):
    if path.endswith('.npy'):
        return np.squeeze(np.load(path)).astype(np.float32)
    if path.endswith('.npz'):
        d = np.load(path)
        key = 'depth' if 'depth' in d else list(d.keys())[0]
        return np.squeeze(d[key]).astype(np.float32)
    return np.asarray(Image.open(path), np.float32) / 256.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--image', required=True)
    ap.add_argument('--pred', default='')
    ap.add_argument('--checkpoint', default='')
    ap.add_argument('--gt', default='')
    ap.add_argument('--output', required=True)
    ap.add_argument('--min-depth', type=float, default=0.5)
    ap.add_argument('--max-depth', type=float, default=15.0)
    ap.add_argument('--colormap', choices=('plasma', 'depth'),
                    default='plasma',
                    help="'plasma' = normalized inverse-depth viz (default);"
                    " 'depth' = the reference's metric red=near->blue=far "
                    "map over [min_depth, max_depth] (reference: "
                    "visualization/colormaps.py)")
    args = ap.parse_args()

    from packnet_sfm_tpu.datasets.io import load_image
    from packnet_sfm_tpu.utils.viz import viz_inv_depth, viz_depth_metric

    rgb = load_image(args.image)
    H, W = rgb.shape[:2]

    if args.pred:
        depth = load_depth_any(args.pred)
    elif args.checkpoint:
        import jax.numpy as jnp
        from packnet_sfm_tpu.config import parse_test_file
        from packnet_sfm_tpu.models import setup_model
        from packnet_sfm_tpu.ops.depth import (
            sigmoid_to_inv_depth, inv2depth)
        cfg, payload = parse_test_file(args.checkpoint)
        model = setup_model(cfg)
        out = model.apply({'params': payload['params'],
                           'batch_stats': payload['batch_stats']},
                          {'rgb': jnp.asarray(rgb[None])}, train=False)
        sig = out['inv_depths'][0]
        depth = np.asarray(inv2depth(sigmoid_to_inv_depth(
            sig, cfg.model.params.min_depth,
            cfg.model.params.max_depth)))[0, ..., 0]
    else:
        raise SystemExit('need --pred or --checkpoint')

    if depth.shape != (H, W):
        from packnet_sfm_tpu.datasets.transforms import resize_depth
        depth = resize_depth(depth[..., None], (H, W))[..., 0]

    inv = np.where(depth > 0, 1.0 / np.maximum(depth, 1e-6), 0.0)
    if args.colormap == 'depth':
        def colorize(inv_map):
            d = np.where(inv_map > 0, 1.0 / np.maximum(inv_map, 1e-6), 0.0)
            return viz_depth_metric(d, args.min_depth, args.max_depth)
    else:
        colorize = viz_inv_depth
    panels = [(rgb * 255).astype(np.uint8),
              (colorize(inv) * 255).astype(np.uint8)]

    if args.gt:
        gt = load_depth_any(args.gt)
        if gt.shape != (H, W):
            from packnet_sfm_tpu.datasets.transforms import \
                resize_depth_preserve
            gt = resize_depth_preserve(gt[..., None], (H, W))[..., 0]
        overlay = panels[1].copy()
        valid = gt > 0
        # GT scatter colored by its own inverse depth, drawn over the pred
        gt_inv = np.where(valid, 1.0 / np.maximum(gt, 1e-6), 0.0)
        gt_col = (colorize(gt_inv) * 255).astype(np.uint8)
        overlay[valid] = gt_col[valid]
        panels.append(overlay)
        err = np.where(valid, np.abs(depth - gt), 0.0)
        err_viz = (viz_inv_depth(err / max(err.max(), 1e-6)) * 255
                   ).astype(np.uint8)
        panels.append(err_viz)

    canvas = np.concatenate(panels, axis=1)
    os.makedirs(os.path.dirname(args.output) or '.', exist_ok=True)
    Image.fromarray(canvas).save(args.output)
    print('saved {} ({} panels: rgb | pred{}{})'.format(
        args.output, len(panels),
        ' | gt-overlay' if args.gt else '',
        ' | abs-err' if args.gt else ''))


if __name__ == '__main__':
    main()
