"""
Evaluate precomputed depth predictions against ground truth
(reference: scripts/evaluation/* precomputed-prediction evaluators, e.g.
eval_npu_output / eval_with_precomputed_predictions — SURVEY.md §2.14).

Predictions and GT are directories of matching-stem .npz ('depth' key) or
16-bit .png (/256) files.

Usage:
    python scripts/evaluation/eval_precomputed.py --pred preds/ --gt gts/
        [--min_depth 0.5] [--max_depth 15] [--crop garg] [--use_gt_scale]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()  # offline host tool: never contend for the TPU tunnel

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--pred', required=True)
    p.add_argument('--gt', required=True)
    p.add_argument('--min_depth', type=float, default=0.5)
    p.add_argument('--max_depth', type=float, default=15.0)
    p.add_argument('--crop', default='', choices=['', 'garg'])
    p.add_argument('--scale_output', default='resize')
    p.add_argument('--use_gt_scale', action='store_true')
    p.add_argument('--output_json', default=None)
    return p.parse_args()


def load_any_depth(path):
    from packnet_sfm_tpu.datasets.io import load_depth
    return load_depth(path)


def main():
    args = parse_args()
    import jax.numpy as jnp
    from packnet_sfm_tpu.ops.depth import compute_depth_metrics
    from packnet_sfm_tpu.utils.logging_utils import (
        print_metrics_table, METRIC_NAMES)

    def stems(d):
        return {os.path.splitext(f)[0]: os.path.join(d, f)
                for f in os.listdir(d) if f.endswith(('.npz', '.png'))}

    preds = stems(args.pred)
    gts = stems(args.gt)
    common = sorted(set(preds) & set(gts))
    assert common, 'No matching prediction/GT stems'
    print('Evaluating {} pairs'.format(len(common)))

    total = np.zeros(7)
    for stem in common:
        pred = load_any_depth(preds[stem])[None, ..., None]
        gt = load_any_depth(gts[stem])[None, ..., None]
        m = compute_depth_metrics(
            jnp.asarray(gt), jnp.asarray(pred), args.min_depth,
            args.max_depth, crop=args.crop, scale_output=args.scale_output,
            use_gt_scale=args.use_gt_scale)
        total += np.asarray(m)
    total /= len(common)
    print_metrics_table('precomputed ({} files)'.format(len(common)),
                        {'depth': total})
    if args.output_json:
        import json
        with open(args.output_json, 'w') as f:
            json.dump(dict(zip(METRIC_NAMES, total.tolist())), f, indent=2)


if __name__ == '__main__':
    main()
