"""
Side-by-side comparison of two prediction sets (e.g. GPU FP32 vs NPU INT8),
optionally against GT: per-image panels rgb | A | B | |A-B| and a metric
delta table (reference: scripts/visualization/compare_gpu_vs_npu.py,
visualize_fp32_vs_npu_vs_gt.py, visualize_fp32_vs_int8_comparison.py).

Predictions matched by stem name; formats npz/npy/png (depth*256).

Usage:
    python scripts/visualization/compare_predictions.py \
        --a gpu_dir --b npu_dir [--images rgb_dir] [--gt gt_dir] \
        --output out_dir [--labels FP32 INT8]
"""

import argparse
import glob
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


def find(dirname, stem):
    for ext in ('.npz', '.npy', '.png'):
        p = os.path.join(dirname, stem + ext)
        if os.path.exists(p):
            return p
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--a', required=True)
    ap.add_argument('--b', required=True)
    ap.add_argument('--images', default='')
    ap.add_argument('--gt', default='')
    ap.add_argument('--output', required=True)
    ap.add_argument('--labels', nargs=2, default=['A', 'B'])
    ap.add_argument('--min-depth', type=float, default=0.5)
    ap.add_argument('--max-depth', type=float, default=15.0)
    args = ap.parse_args()

    from packnet_sfm_tpu.utils.viz import viz_inv_depth
    from packnet_sfm_tpu.utils.logging_utils import (
        print_metrics_table, METRIC_NAMES)

    os.makedirs(args.output, exist_ok=True)
    stems = sorted(os.path.splitext(os.path.basename(f))[0]
                   for f in glob.glob(os.path.join(args.a, '*'))
                   if f.endswith(('.npz', '.npy', '.png')))
    rows_a, rows_b = [], []
    n_done = 0
    for stem in stems:
        fb = find(args.b, stem)
        if fb is None:
            continue
        da = load_depth_any(find(args.a, stem))
        db = load_depth_any(fb)
        if da.shape != db.shape:
            from packnet_sfm_tpu.datasets.transforms import resize_depth
            db = resize_depth(db[..., None], da.shape)[..., 0]
        panels = []
        if args.images:
            fi = find(args.images, stem) or os.path.join(
                args.images, stem + '.jpg')
            if os.path.exists(fi):
                rgb = np.asarray(Image.open(fi).convert('RGB'))
                if rgb.shape[:2] != da.shape:
                    rgb = np.asarray(Image.fromarray(rgb).resize(
                        (da.shape[1], da.shape[0])))
                panels.append(rgb)
        for d in (da, db):
            inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-6), 0.0)
            panels.append((viz_inv_depth(inv) * 255).astype(np.uint8))
        diff = np.abs(da - db)
        panels.append((viz_inv_depth(diff / max(diff.max(), 1e-6)) * 255
                       ).astype(np.uint8))
        Image.fromarray(np.concatenate(panels, axis=1)).save(
            os.path.join(args.output, stem + '_cmp.png'))
        n_done += 1

        if args.gt:
            fg = find(args.gt, stem)
            if fg is not None:
                import jax.numpy as jnp
                from packnet_sfm_tpu.ops.depth import compute_depth_metrics
                gt = load_depth_any(fg)
                for d, acc in ((da, rows_a), (db, rows_b)):
                    m = compute_depth_metrics(
                        jnp.asarray(gt)[None, ..., None],
                        jnp.asarray(d)[None, ..., None],
                        args.min_depth, args.max_depth,
                        scale_output='resize', use_gt_scale=False)
                    acc.append(np.asarray(m))
    print('{} comparison panels -> {}'.format(n_done, args.output))
    if rows_a:
        table = {args.labels[0]: np.stack(rows_a).mean(0),
                 args.labels[1]: np.stack(rows_b).mean(0),
                 'delta': np.stack(rows_b).mean(0) - np.stack(rows_a).mean(0)}
        print_metrics_table('{} vs {} ({} images with GT)'.format(
            args.labels[0], args.labels[1], len(rows_a)), table)


if __name__ == '__main__':
    main()
