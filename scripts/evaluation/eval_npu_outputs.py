"""
Evaluate NPU (or any precomputed) depth outputs against GT depth maps
(reference: scripts/evaluation/evaluate_npu_direct_depth_official.py,
eval_dual_head_npu.py, evaluate_unified.py).

Predictions: a directory of per-image outputs matched to GT by stem name.
  .npy / .npz  — raw arrays (fp32); dual-head accepts 2-channel or
                 integer_/fractional_ paired files
  .png         — 16-bit depth*256
Output kinds (--kind):
  depth         direct metric depth (NPU Direct-Depth head)
  sigmoid       single sigmoid -> sigmoid_to_depth_{linear,log}
  dual-head     integer+fractional sigmoids -> int*max_depth + frac

GT: 16-bit PNG depth*256 (NCDB newest_depth_maps convention) or npz.

Prints per-image rows and the mean metric table (7 official metrics).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()  # offline host tool: never contend for the TPU tunnel

import numpy as np


def load_any(path):
    if path.endswith('.npy'):
        return np.load(path).astype(np.float32)
    if path.endswith('.npz'):
        d = np.load(path)
        key = 'depth' if 'depth' in d else list(d.keys())[0]
        return d[key].astype(np.float32)
    from PIL import Image
    return np.asarray(Image.open(path), np.float32) / 256.0


def find_pred(pred_dir, stem, kind):
    """Locate prediction file(s) for a GT stem."""
    for ext in ('.npy', '.npz', '.png'):
        p = os.path.join(pred_dir, stem + ext)
        if os.path.exists(p):
            return (p,)
    if kind == 'dual-head':
        pi = glob.glob(os.path.join(pred_dir, 'integer_' + stem + '.*'))
        pf = glob.glob(os.path.join(pred_dir, 'fractional_' + stem + '.*'))
        if pi and pf:
            return (pi[0], pf[0])
    return None


def to_depth(files, kind, min_depth, max_depth, use_log):
    import jax.numpy as jnp
    from packnet_sfm_tpu.ops.depth import (
        sigmoid_to_inv_depth, inv2depth, dual_head_to_depth)
    if kind == 'depth':
        return load_any(files[0])
    if kind == 'sigmoid':
        sig = load_any(files[0])
        inv = sigmoid_to_inv_depth(jnp.asarray(sig), min_depth, max_depth,
                                   use_log)
        return np.asarray(inv2depth(inv))
    if kind == 'dual-head':
        if len(files) == 2:
            integer, frac = load_any(files[0]), load_any(files[1])
        else:
            arr = load_any(files[0])
            integer, frac = arr[..., 0], arr[..., 1]
        return np.asarray(dual_head_to_depth(
            np.squeeze(integer), np.squeeze(frac), max_depth))
    raise ValueError(kind)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pred-dir', required=True)
    ap.add_argument('--gt-dir', required=True)
    ap.add_argument('--kind', default='depth',
                    choices=['depth', 'sigmoid', 'dual-head'])
    ap.add_argument('--min-depth', type=float, default=0.5)
    ap.add_argument('--max-depth', type=float, default=15.0)
    ap.add_argument('--use-log-space', action='store_true')
    ap.add_argument('--crop', default='', choices=['', 'garg'])
    ap.add_argument('--gt-scale', action='store_true',
                    help='median-scale predictions to GT')
    ap.add_argument('--output-json', default='')
    args = ap.parse_args()

    import jax.numpy as jnp
    from packnet_sfm_tpu.ops.depth import compute_depth_metrics
    from packnet_sfm_tpu.utils.logging_utils import (
        print_metrics_table, METRIC_NAMES)

    gt_files = sorted(
        glob.glob(os.path.join(args.gt_dir, '*.png')) +
        glob.glob(os.path.join(args.gt_dir, '*.npz')))
    rows, names = [], []
    missing = 0
    for gf in gt_files:
        stem = os.path.splitext(os.path.basename(gf))[0]
        pred_files = find_pred(args.pred_dir, stem, args.kind)
        if pred_files is None:
            missing += 1
            continue
        gt = np.squeeze(load_any(gf))
        pred = np.squeeze(to_depth(pred_files, args.kind, args.min_depth,
                                   args.max_depth, args.use_log_space))
        m = compute_depth_metrics(
            jnp.asarray(gt)[None, ..., None],
            jnp.asarray(pred)[None, ..., None],
            args.min_depth, args.max_depth, crop=args.crop,
            scale_output='resize', use_gt_scale=args.gt_scale)
        rows.append(np.asarray(m))
        names.append(stem)
        print('{:40s} ' .format(stem) + ' '.join(
            '{}={:.4f}'.format(n, v) for n, v in zip(METRIC_NAMES, rows[-1])))
    if not rows:
        print('no matched predictions (missing={})'.format(missing))
        return 1
    mean = np.stack(rows).mean(0)
    print_metrics_table(
        'NPU eval ({} images, {} missing, kind={})'.format(
            len(rows), missing, args.kind), {'depth': mean})
    if args.output_json:
        import json
        with open(args.output_json, 'w') as f:
            json.dump({'mean': {n: float(v) for n, v in
                                zip(METRIC_NAMES, mean)},
                       'per_image': {s: {n: float(v) for n, v in
                                         zip(METRIC_NAMES, r)}
                                     for s, r in zip(names, rows)}},
                      f, indent=2)
    return 0


if __name__ == '__main__':
    sys.exit(main())
