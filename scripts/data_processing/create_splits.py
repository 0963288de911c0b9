"""
Split-file creation for KITTI-style (txt) and NCDB-style (json) datasets
(reference: scripts/data_processing split creators — SURVEY.md §2.14).

Usage:
    # KITTI txt split from image glob, 90/10 train/val
    python scripts/data_processing/create_splits.py kitti --root /data/kitti \
        --pattern '*/\*_sync/image_02/data/*.png' --val_fraction 0.1 --out splits/

    # NCDB json split
    python scripts/data_processing/create_splits.py ncdb --root /data/ncdb \
        --val_fraction 0.1 --out splits/
"""

import argparse
import glob
import json
import os
import sys

import numpy as np


def kitti_split(args):
    files = sorted(glob.glob(os.path.join(args.root, args.pattern)))
    rel = [os.path.relpath(f, args.root) for f in files]
    rng = np.random.RandomState(args.seed)
    idx = rng.permutation(len(rel))
    n_val = int(len(rel) * args.val_fraction)
    val = sorted(idx[:n_val].tolist())
    train = sorted(idx[n_val:].tolist())
    os.makedirs(args.out, exist_ok=True)
    for name, ids in [('train', train), ('val', val)]:
        path = os.path.join(args.out, '{}.txt'.format(name))
        with open(path, 'w') as f:
            f.write('\n'.join(rel[i] for i in ids))
        print('wrote {} ({} files)'.format(path, len(ids)))


def ncdb_split(args):
    img_dirs = glob.glob(os.path.join(args.root, '**', 'image_a6'),
                         recursive=True)
    entries = []
    for d in sorted(img_dirs):
        base = os.path.relpath(os.path.dirname(d), args.root)
        for f in sorted(os.listdir(d)):
            if f.endswith(('.png', '.jpg')):
                entries.append({'dataset_root': base,
                                'new_filename': os.path.splitext(f)[0]})
    rng = np.random.RandomState(args.seed)
    idx = rng.permutation(len(entries))
    n_val = int(len(entries) * args.val_fraction)
    os.makedirs(args.out, exist_ok=True)
    for name, ids in [('train', idx[n_val:]), ('val', idx[:n_val])]:
        path = os.path.join(args.out, '{}.json'.format(name))
        with open(path, 'w') as f:
            json.dump([entries[i] for i in sorted(ids.tolist())], f, indent=1)
        print('wrote {} ({} entries)'.format(path, len(ids)))


def calib_split(args):
    """Depth-stratified INT8 calibration split from a metadata CSV
    (reference: scripts/data_processing/create_calibration_split.py:16-80 —
    bins [0,3,8,15,100] m on mean_depth, near/mid/far/very_far sampled at
    25/40/25/10%; under-populated bins keep what they have)."""
    import csv
    with open(args.metadata) as f:
        rows = list(csv.DictReader(f))
    bins = [float(b) for b in args.depth_bins.split(',')]
    ratios = [float(r) for r in args.ratios.split(',')]
    assert len(ratios) == len(bins) - 1, 'need one ratio per bin'
    rng = np.random.RandomState(args.seed)
    picked = []
    for i in range(len(bins) - 1):
        lo, hi = bins[i], bins[i + 1]
        in_bin = [r for r in rows
                  if lo < float(r.get('mean_depth') or 0) <= hi]
        target = int(args.target_size * ratios[i])
        take = min(target, len(in_bin))
        sel = rng.permutation(len(in_bin))[:take]
        picked.extend(in_bin[j] for j in sorted(sel.tolist()))
        print('bin ({:g}, {:g}] m: {} available, {} sampled'.format(
            lo, hi, len(in_bin), take))
    entries = []
    for r in picked:
        e = {'new_filename': r.get('new_filename') or r.get('stem') or
             r.get('filename')}
        if r.get('dataset_root'):
            e['dataset_root'] = r['dataset_root']
        entries.append(e)
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(entries, f, indent=1)
    print('wrote {} ({} calibration samples)'.format(args.out, len(entries)))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='kind', required=True)
    for kind, fn in [('kitti', kitti_split), ('ncdb', ncdb_split)]:
        sp = sub.add_parser(kind)
        sp.add_argument('--root', required=True)
        sp.add_argument('--out', required=True)
        sp.add_argument('--val_fraction', type=float, default=0.1)
        sp.add_argument('--seed', type=int, default=42)
        if kind == 'kitti':
            sp.add_argument('--pattern',
                            default='*/*_sync/image_02/data/*.png')
        sp.set_defaults(fn=fn)
    sp = sub.add_parser('calib', help='depth-stratified calibration split '
                        'from a create_ncdb_metadata.py CSV')
    sp.add_argument('--metadata', required=True)
    sp.add_argument('--out', default='outputs/calibration/calibration_split.json')
    sp.add_argument('--target_size', type=int, default=300)
    sp.add_argument('--depth_bins', default='0,3,8,15,100')
    sp.add_argument('--ratios', default='0.25,0.40,0.25,0.10')
    sp.add_argument('--seed', type=int, default=42)
    sp.set_defaults(fn=calib_split)
    args = p.parse_args()
    args.fn(args)


if __name__ == '__main__':
    main()
