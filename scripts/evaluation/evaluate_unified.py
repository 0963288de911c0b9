"""
Unified FP32 / NPU evaluation on identical samples
(reference: scripts/evaluation/evaluate_unified.py — fp32 | npu | compare
modes over the same test set for a fair INT8-deployment comparison).

This repo's composition: `--mode fp32` runs the framework checkpoint over
the image dir (scripts/evaluation/generate_predictions.py machinery) and
scores the dumps against GT; `--mode npu` scores a directory of NPU output
dumps; `--mode compare` does both restricted to the stems BOTH sides have,
and prints the per-metric delta table. Scoring always goes through the
same jitted compute_depth_metrics as the eval CLIs.

Usage:
    python scripts/evaluation/evaluate_unified.py --mode fp32 \
        --checkpoint ckpt.npz --images rgb_dir --gt gt_dir [--workdir d]
    python scripts/evaluation/evaluate_unified.py --mode npu \
        --npu-dir npu_out --gt gt_dir [--kind depth|dual_head]
    python scripts/evaluation/evaluate_unified.py --mode compare \
        --checkpoint ckpt.npz --images rgb_dir --npu-dir npu_out --gt gt
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()

import numpy as np

METRIC_KEYS = ('abs_rel', 'sqr_rel', 'rmse', 'rmse_log', 'a1', 'a2', 'a3')


def _stems(dirname, exts=('.npz', '.npy', '.png')):
    return {os.path.splitext(os.path.basename(f))[0]
            for f in glob.glob(os.path.join(dirname, '*'))
            if f.endswith(exts)}


def _load(dirname, stem):
    from PIL import Image
    for ext in ('.npz', '.npy', '.png'):
        p = os.path.join(dirname, stem + ext)
        if not os.path.exists(p):
            continue
        if ext == '.npy':
            return np.squeeze(np.load(p)).astype(np.float32)
        if ext == '.npz':
            d = np.load(p)
            key = 'depth' if 'depth' in d else list(d.keys())[0]
            return np.squeeze(d[key]).astype(np.float32)
        return np.asarray(Image.open(p), np.float32) / 256.0
    return None


def score_dir(pred_dir, gt_dir, stems, args):
    import jax.numpy as jnp
    from packnet_sfm_tpu.ops.depth import compute_depth_metrics
    from packnet_sfm_tpu.datasets.transforms import resize_depth
    rows = []
    for stem in sorted(stems):
        pred, gt = _load(pred_dir, stem), _load(gt_dir, stem)
        if pred is None or gt is None:
            continue
        if pred.shape != gt.shape:
            pred = resize_depth(pred[..., None], gt.shape)[..., 0]
        rows.append(np.asarray(compute_depth_metrics(
            jnp.asarray(gt)[None, ..., None],
            jnp.asarray(pred)[None, ..., None],
            args.min_depth, args.max_depth,
            crop=args.crop, scale_output='resize',
            use_gt_scale=args.gt_scale)))
    return np.stack(rows).mean(0) if rows else None, len(rows)


def run_fp32_dumps(args, workdir):
    """Dump framework predictions for every image (same machinery as
    generate_predictions.py) and return the dump dir."""
    out = os.path.join(workdir, 'fp32')
    cmd = [sys.executable,
           os.path.join(os.path.dirname(__file__),
                        'generate_predictions.py'),
           '--checkpoint', args.checkpoint, '--images', args.images,
           '--output', out, '--save', 'npz']
    if args.image_shape:
        cmd += ['--image_shape'] + [str(s) for s in args.image_shape]
    env = dict(os.environ, JAX_PLATFORMS=os.environ.get(
        'JAX_PLATFORMS', 'cpu'))
    subprocess.run(cmd, check=True, env=env)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', required=True,
                    choices=['fp32', 'npu', 'compare'])
    ap.add_argument('--checkpoint', default='')
    ap.add_argument('--images', default='')
    ap.add_argument('--image_shape', type=int, nargs=2, default=None)
    ap.add_argument('--npu-dir', default='')
    ap.add_argument('--gt', required=True)
    ap.add_argument('--min-depth', type=float, default=0.5)
    ap.add_argument('--max-depth', type=float, default=15.0)
    ap.add_argument('--crop', default='', choices=['', 'garg'])
    ap.add_argument('--gt-scale', action='store_true')
    ap.add_argument('--workdir', default='',
                    help='where fp32 dumps go (default: temp dir)')
    ap.add_argument('--output-json', default='')
    args = ap.parse_args(argv)

    from packnet_sfm_tpu.utils.logging_utils import print_metrics_table

    need_fp32 = args.mode in ('fp32', 'compare')
    need_npu = args.mode in ('npu', 'compare')
    if need_fp32 and not (args.checkpoint and args.images):
        ap.error('--mode {} needs --checkpoint and --images'.format(
            args.mode))
    if need_npu and not args.npu_dir:
        ap.error('--mode {} needs --npu-dir'.format(args.mode))

    workdir = args.workdir or tempfile.mkdtemp(prefix='eval_unified_')
    results, table = {}, {}
    fp32_dir = run_fp32_dumps(args, workdir) if need_fp32 else None

    stems = _stems(args.gt)
    if need_fp32:
        stems &= _stems(fp32_dir)
    if need_npu:
        stems &= _stems(args.npu_dir)

    if need_fp32:
        mean, count = score_dir(fp32_dir, args.gt, stems, args)
        if mean is not None:
            results['fp32'] = dict(zip(METRIC_KEYS, map(float, mean)),
                                   count=count)
            table['FP32'] = mean
    if need_npu:
        mean, count = score_dir(args.npu_dir, args.gt, stems, args)
        if mean is not None:
            results['npu'] = dict(zip(METRIC_KEYS, map(float, mean)),
                                  count=count)
            table['NPU'] = mean
    if 'FP32' in table and 'NPU' in table:
        table['delta'] = table['NPU'] - table['FP32']
        results['delta'] = dict(zip(
            METRIC_KEYS, map(float, table['delta'])))

    if not table:
        print('no overlapping (pred, gt) samples', file=sys.stderr)
        return 1
    print_metrics_table(
        'unified eval [{}] over {} shared samples'.format(
            args.mode, len(stems)), table)
    if args.output_json:
        with open(args.output_json, 'w') as f:
            json.dump(results, f, indent=2)
        print('-> {}'.format(args.output_json))
    return 0


if __name__ == '__main__':
    sys.exit(main())
