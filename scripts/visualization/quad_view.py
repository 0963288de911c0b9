"""
Quad-view visualization: RGB | predicted depth | GT depth | abs-error panels
stitched per frame (reference: scripts/visualization video quad-view tools —
SURVEY.md §2.13/§2.14).

Usage:
    python scripts/visualization/quad_view.py --rgb_dir imgs/ --pred_dir preds/
        [--gt_dir gts/] --output quads/ [--max_depth 15]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--rgb_dir', required=True)
    p.add_argument('--pred_dir', required=True)
    p.add_argument('--gt_dir', default=None)
    p.add_argument('--output', required=True)
    p.add_argument('--max_depth', type=float, default=15.0)
    p.add_argument('--limit', type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    from packnet_sfm_tpu.datasets.io import load_image, load_depth, write_image
    from packnet_sfm_tpu.utils.viz import viz_inv_depth, apply_colormap

    def stems(d, exts):
        return {os.path.splitext(f)[0]: os.path.join(d, f)
                for f in sorted(os.listdir(d)) if f.endswith(exts)}

    rgbs = stems(args.rgb_dir, ('.png', '.jpg'))
    preds = stems(args.pred_dir, ('.npz', '.png'))
    gts = stems(args.gt_dir, ('.npz', '.png')) if args.gt_dir else {}
    common = sorted(set(rgbs) & set(preds))
    if args.limit:
        common = common[:args.limit]
    os.makedirs(args.output, exist_ok=True)

    for stem in common:
        rgb = load_image(rgbs[stem])
        depth = load_depth(preds[stem])
        H, W = rgb.shape[:2]
        inv = np.where(depth > 0, 1.0 / np.maximum(depth, 1e-6), 0.0)
        panels = [rgb, viz_inv_depth(inv)]
        if stem in gts:
            gt = load_depth(gts[stem])
            inv_gt = np.where(gt > 0, 1.0 / np.maximum(gt, 1e-6), 0.0)
            panels.append(viz_inv_depth(inv_gt))
            err = np.where(gt > 0, np.abs(depth - gt), 0.0)
            panels.append(apply_colormap(
                np.clip(err / (0.2 * args.max_depth), 0, 1)))
        # 2x2 grid (pad with black if fewer than 4 panels)
        while len(panels) < 4:
            panels.append(np.zeros_like(rgb))
        panels = [p if p.shape[:2] == (H, W) else
                  np.zeros((H, W, 3), np.float32) for p in panels]
        top = np.concatenate(panels[:2], axis=1)
        bottom = np.concatenate(panels[2:4], axis=1)
        write_image(os.path.join(args.output, stem + '_quad.png'),
                    np.concatenate([top, bottom], axis=0))
    print('wrote {} quad views to {}'.format(len(common), args.output))


if __name__ == '__main__':
    main()
