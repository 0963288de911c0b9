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
    args = p.parse_args()
    args.fn(args)


if __name__ == '__main__':
    main()
