"""
Three-way depth comparison: prediction A (e.g. framework FP32) vs
prediction B (e.g. NPU INT8) vs ground truth, per-image 2x3 panels
(GT | A | B over |GT-A| | |GT-B| | |A-B|) with metric annotations,
worst-N selection, and an HTML index.

TPU-framework counterpart of the reference's NPU validation triptych
(reference: scripts/visualization/visualize_fp32_vs_npu_vs_gt.py,
compare_gpu_vs_npu.py, visualize_npu_vs_gt.py). Differences by design:
predictions are matched by stem across plain directories (npz/npy/png*256
— the formats every dump tool in this repo emits), dual-head component
dirs compose on the fly, and ranking uses the same jitted
compute_depth_metrics as the eval CLIs, so the "worst images" here are
the worst images of the real eval protocol.

Usage:
    python scripts/visualization/visualize_triptych.py \
        --a fp32_dir --b npu_dir --gt gt_dir [--images rgb_dir] \
        --output out_dir [--labels FP32 NPU] [--worst 20 --rank-by b]
        [--compose-dual-head]  # dirs hold <stem>_integer/_fractional.npy
"""

import argparse
import glob
import html
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()  # offline host tool: never contend for the TPU tunnel

import numpy as np
from PIL import Image

METRIC_KEYS = ('abs_rel', 'sqr_rel', 'rmse', 'rmse_log', 'a1', 'a2', 'a3')


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


def load_pred(dirname, stem, compose_dual_head, max_depth):
    """Composed depth from a flat dump or from dual-head component files
    (<stem>_integer.npy + <stem>_fractional.npy, reference composition
    scripts/visualization/visualize_fp32_vs_npu_vs_gt.py:135-137)."""
    if compose_dual_head:
        fi = os.path.join(dirname, stem + '_integer.npy')
        ff = os.path.join(dirname, stem + '_fractional.npy')
        if os.path.exists(fi) and os.path.exists(ff):
            integer = np.squeeze(np.load(fi)).astype(np.float32)
            frac = np.squeeze(np.load(ff)).astype(np.float32)
            return np.clip(integer * max_depth + frac, 0.0, max_depth)
        return None
    p = find(dirname, stem)
    return None if p is None else load_depth_any(p)


def depth_panel(depth, max_depth):
    from packnet_sfm_tpu.utils.viz import viz_inv_depth
    inv = np.where(depth > 0, 1.0 / np.maximum(depth, 1e-6), 0.0)
    return (viz_inv_depth(inv) * 255).astype(np.uint8)


def error_panel(err, scale):
    from packnet_sfm_tpu.utils.viz import viz_inv_depth
    return (viz_inv_depth(err / max(scale, 1e-6)) * 255).astype(np.uint8)


def annotate(img, text):
    from PIL import ImageDraw
    img = Image.fromarray(img)
    ImageDraw.Draw(img).text((4, 2), text, fill=(255, 255, 255))
    return np.asarray(img)


def panel_2x3(gt, da, db, labels, max_depth, met_a, met_b):
    def fmt(m):
        return ' '.join('{}:{:.3f}'.format(k, v)
                        for k, v in zip(METRIC_KEYS[:4], m))
    err_scale = max(np.abs(gt[gt > 0] - da[gt > 0]).max() if (gt > 0).any()
                    else 1.0, 1e-6)
    valid = (gt > 0).astype(np.float32)
    row1 = np.concatenate([
        annotate(depth_panel(gt, max_depth), 'GT'),
        annotate(depth_panel(da, max_depth),
                 '{}  {}'.format(labels[0], fmt(met_a))),
        annotate(depth_panel(db, max_depth),
                 '{}  {}'.format(labels[1], fmt(met_b))),
    ], axis=1)
    row2 = np.concatenate([
        annotate(error_panel(np.abs(gt - da) * valid, err_scale),
                 '|GT-{}|'.format(labels[0])),
        annotate(error_panel(np.abs(gt - db) * valid, err_scale),
                 '|GT-{}|'.format(labels[1])),
        annotate(error_panel(np.abs(da - db), err_scale),
                 '|{}-{}|'.format(*labels)),
    ], axis=1)
    return np.concatenate([row1, row2], axis=0)


def write_index(out_dir, entries, labels):
    lines = ['<html><head><meta charset="utf-8">'
             '<title>{} vs {} vs GT</title></head><body>'.format(
                 html.escape(labels[0]), html.escape(labels[1])),
             '<h1>{} vs {} vs GT ({} images)</h1>'.format(
                 html.escape(labels[0]), html.escape(labels[1]),
                 len(entries))]
    for stem, met_a, met_b in entries:
        lines.append(
            '<div style="margin:12px"><h3>{0}</h3>'
            '<img src="{0}_triptych.png" style="max-width:100%">'
            '<div style="font-size:12px">{1} abs_rel {2:.4f} rmse {3:.3f}'
            ' &nbsp;|&nbsp; {4} abs_rel {5:.4f} rmse {6:.3f}</div></div>'
            .format(html.escape(stem), html.escape(labels[0]), met_a[0],
                    met_a[2], html.escape(labels[1]), met_b[0], met_b[2]))
    lines.append('</body></html>')
    path = os.path.join(out_dir, 'index.html')
    with open(path, 'w') as f:
        f.write('\n'.join(lines))
    return path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--a', required=True, help='prediction dir A (e.g. FP32)')
    ap.add_argument('--b', required=True, help='prediction dir B (e.g. NPU)')
    ap.add_argument('--gt', required=True, help='ground-truth depth dir')
    ap.add_argument('--images', default='', help='optional RGB dir')
    ap.add_argument('--output', required=True)
    ap.add_argument('--labels', nargs=2, default=['FP32', 'NPU'])
    ap.add_argument('--min-depth', type=float, default=0.5)
    ap.add_argument('--max-depth', type=float, default=15.0)
    ap.add_argument('--worst', type=int, default=0,
                    help='render only the N worst images by --rank-by')
    ap.add_argument('--rank-by', choices=['a', 'b', 'delta'], default='b',
                    help='worst-N ranking: abs_rel of A, of B, or |B-A|')
    ap.add_argument('--compose-dual-head', action='store_true',
                    help='pred dirs hold <stem>_integer/_fractional.npy')
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from packnet_sfm_tpu.ops.depth import compute_depth_metrics
    from packnet_sfm_tpu.utils.logging_utils import print_metrics_table
    from packnet_sfm_tpu.datasets.transforms import resize_depth

    os.makedirs(args.output, exist_ok=True)
    stems = sorted({os.path.splitext(os.path.basename(f))[0]
                    .replace('_integer', '').replace('_fractional', '')
                    for f in glob.glob(os.path.join(args.gt, '*'))
                    if f.endswith(('.npz', '.npy', '.png'))})

    def metrics(gt, pred):
        return np.asarray(compute_depth_metrics(
            jnp.asarray(gt)[None, ..., None],
            jnp.asarray(pred)[None, ..., None],
            args.min_depth, args.max_depth,
            scale_output='resize', use_gt_scale=False))

    rows = []
    for stem in stems:
        fg = find(args.gt, stem)
        da = load_pred(args.a, stem, args.compose_dual_head, args.max_depth)
        db = load_pred(args.b, stem, args.compose_dual_head, args.max_depth)
        if fg is None or da is None or db is None:
            continue
        gt = load_depth_any(fg)
        if da.shape != gt.shape:
            da = resize_depth(da[..., None], gt.shape)[..., 0]
        if db.shape != gt.shape:
            db = resize_depth(db[..., None], gt.shape)[..., 0]
        rows.append((stem, gt, da, db, metrics(gt, da), metrics(gt, db)))
    if not rows:
        print('no (A, B, GT) triples matched', file=sys.stderr)
        return 1

    if args.worst > 0:
        def badness(r):
            if args.rank_by == 'a':
                return r[4][0]
            if args.rank_by == 'b':
                return r[5][0]
            return abs(r[5][0] - r[4][0])
        rows.sort(key=badness, reverse=True)
        rendered = rows[:args.worst]
    else:
        rendered = rows

    entries = []
    for stem, gt, da, db, met_a, met_b in rendered:
        panel = panel_2x3(gt, da, db, args.labels, args.max_depth,
                          met_a, met_b)
        if args.images:
            fi = find(args.images, stem) or os.path.join(
                args.images, stem + '.jpg')
            if os.path.exists(fi):
                rgb = np.asarray(Image.open(fi).convert('RGB'))
                if rgb.shape[:2] != gt.shape:
                    rgb = np.asarray(Image.fromarray(rgb).resize(
                        (gt.shape[1], gt.shape[0])))
                pad = np.zeros((gt.shape[0], panel.shape[1] - gt.shape[1], 3),
                               np.uint8)
                panel = np.concatenate(
                    [np.concatenate([rgb, pad], axis=1), panel], axis=0)
        Image.fromarray(panel).save(
            os.path.join(args.output, stem + '_triptych.png'))
        entries.append((stem, met_a, met_b))

    index = write_index(args.output, entries, args.labels)
    ma = np.stack([r[4] for r in rows]).mean(0)
    mb = np.stack([r[5] for r in rows]).mean(0)
    print_metrics_table(
        '{} / {} vs GT over {} images ({} rendered)'.format(
            args.labels[0], args.labels[1], len(rows), len(entries)),
        {args.labels[0]: ma, args.labels[1]: mb, 'delta': mb - ma})
    print('{} panels + {}'.format(len(entries), index))
    return 0


if __name__ == '__main__':
    sys.exit(main())
