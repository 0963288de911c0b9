#!/usr/bin/env python3
"""Combined NCDB split generator.

Scans several dataset roots for `image_a6/*.png|jpg` frames and writes
seeded-shuffle train/val/test JSON splits in the `{dataset_root,
new_filename}` entry format consumed by `NcdbDataset._load_split`
(reference behavior: scripts/data_processing/create_combined_splits.py:16-102;
default 80/10/10 ratios, combined_{train,val,test}.json filenames).
"""

import argparse
import json
import random
from pathlib import Path


def scan_image_dir(dataset_root):
    """All image stems under <root>/image_a6 as split entries."""
    dataset_root = Path(dataset_root)
    image_dir = dataset_root / 'image_a6'
    if not image_dir.is_dir():
        print('skip (no image_a6): {}'.format(dataset_root))
        return []
    stems = sorted(p.stem for ext in ('*.png', '*.jpg')
                   for p in image_dir.glob(ext))
    return [{'dataset_root': str(dataset_root), 'new_filename': s}
            for s in stems]


def split_entries(entries, ratios, seed):
    """Seeded shuffle + contiguous train/val/test partition."""
    train_r, val_r, test_r = ratios
    if abs(train_r + val_r + test_r - 1.0) > 1e-6:
        raise ValueError('ratios must sum to 1.0, got {}'.format(ratios))
    entries = list(entries)
    random.Random(seed).shuffle(entries)
    n = len(entries)
    i = int(n * train_r)
    j = i + int(n * val_r)
    return {'combined_train.json': entries[:i],
            'combined_val.json': entries[i:j],
            'combined_test.json': entries[j:]}


def write_splits(splits, output_dir):
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    total = sum(len(v) for v in splits.values()) or 1
    for name, data in splits.items():
        path = output_dir / name
        with open(path, 'w') as f:
            json.dump(data, f, indent=2)
        print('{}: {} entries ({:.1f}%)'.format(
            path, len(data), 100.0 * len(data) / total))


def create_combined_splits(dataset_roots, output_dir,
                           ratios=(0.8, 0.1, 0.1), seed=42):
    entries = []
    for root in dataset_roots:
        found = scan_image_dir(root)
        print('{}: {} samples'.format(Path(root).name, len(found)))
        entries.extend(found)
    print('total: {} samples'.format(len(entries)))
    splits = split_entries(entries, ratios, seed)
    write_splits(splits, output_dir)
    return splits


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--datasets', '-d', nargs='+', required=True,
                    help='dataset root folders (each containing image_a6/)')
    ap.add_argument('--output', '-o', required=True)
    ap.add_argument('--ratio', '-r', nargs=3, type=float,
                    default=[0.8, 0.1, 0.1])
    ap.add_argument('--seed', '-s', type=int, default=42)
    args = ap.parse_args(argv)
    create_combined_splits(args.datasets, args.output,
                           tuple(args.ratio), args.seed)


if __name__ == '__main__':
    main()
