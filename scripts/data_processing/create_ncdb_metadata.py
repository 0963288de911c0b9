#!/usr/bin/env python3
"""Per-sample NCDB depth-statistics metadata (CSV) for INT8 calibration.

Walks a JSON split, loads each sample's 16-bit depth PNG through the
framework's NCDB loader semantics (/256 scale, zeros invalid), and writes
one CSV row per sample with depth distribution stats and a heuristic
scene-type label. Reference behavior:
scripts/data_processing/create_ncdb_metadata.py:11-209 (variant priority
list, <5 m indoor / <15 m outdoor_near / else outdoor_far labels).
"""

import argparse
import csv
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
from packnet_sfm_tpu.datasets.ncdb import _load_depth_png  # noqa: E402

# search order when a sample's depth may live in several export variants
DEPTH_VARIANTS = ['newest_depth_maps', 'newest_synthetic_depth_maps',
                  'new_depth_maps', 'depth_maps']

CSV_FIELDS = ['dataset_root', 'filename', 'image_path', 'depth_path',
              'depth_variant', 'mean_depth', 'median_depth', 'min_depth',
              'max_depth', 'std_depth', 'p50', 'p90', 'p95', 'width',
              'height', 'scene_type', 'valid_pixels', 'total_pixels']


def scene_type(mean_depth):
    if mean_depth < 5.0:
        return 'indoor'
    if mean_depth < 15.0:
        return 'outdoor_near'
    return 'outdoor_far'


def find_depth(base_dir, stem, variants):
    for v in variants:
        p = base_dir / v / (stem + '.png')
        if p.exists():
            return p, v
    return None, None


def sample_row(root, entry, variants):
    """One CSV row (dict) for a split entry, or None to skip."""
    base = root / entry.get('dataset_root', '')
    stem = entry.get('new_filename', '')
    if not stem:
        return None
    image_path = base / 'image_a6' / (stem + '.png')
    if not image_path.exists():
        image_path = base / 'image_a6' / (stem + '.jpg')
        if not image_path.exists():
            return None
    depth_path, variant = find_depth(base, stem, variants)
    if depth_path is None:
        return None
    depth = _load_depth_png(depth_path)
    valid = depth[depth > 0]
    if valid.size == 0:
        return None
    from PIL import Image
    width, height = Image.open(image_path).size
    mean = float(valid.mean())

    def rel(p):
        try:
            return str(p.relative_to(root))
        except ValueError:
            return str(p)

    return {
        'dataset_root': entry.get('dataset_root', ''),
        'filename': stem,
        'image_path': rel(image_path),
        'depth_path': rel(depth_path),
        'depth_variant': variant,
        'mean_depth': mean,
        'median_depth': float(np.median(valid)),
        'min_depth': float(valid.min()),
        'max_depth': float(valid.max()),
        'std_depth': float(valid.std()),
        'p50': float(np.percentile(valid, 50)),
        'p90': float(np.percentile(valid, 90)),
        'p95': float(np.percentile(valid, 95)),
        'width': width,
        'height': height,
        'scene_type': scene_type(mean),
        'valid_pixels': int(valid.size),
        'total_pixels': int(depth.size),
    }


def analyze_split(dataset_root, split_file, variants=None):
    root = Path(dataset_root)
    split_path = Path(split_file)
    if not split_path.is_absolute():
        split_path = root / split_file
    with open(split_path) as f:
        entries = json.load(f)
    rows, skipped = [], 0
    for entry in entries:
        row = sample_row(root, entry, variants or DEPTH_VARIANTS)
        if row is None:
            skipped += 1
        else:
            rows.append(row)
    return rows, skipped


def summarize(rows, skipped):
    print('samples: {}  skipped: {}'.format(len(rows), skipped))
    if not rows:
        return
    means = np.array([r['mean_depth'] for r in rows])
    print('mean depth: {:.2f} m (std {:.2f})'.format(means.mean(),
                                                     means.std()))
    for label in ('indoor', 'outdoor_near', 'outdoor_far'):
        n = sum(1 for r in rows if r['scene_type'] == label)
        if n:
            print('  {}: {}'.format(label, n))
    for v in DEPTH_VARIANTS:
        n = sum(1 for r in rows if r['depth_variant'] == v)
        if n:
            print('  variant {}: {}'.format(v, n))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--dataset_root', required=True)
    ap.add_argument('--split_file', default='splits/combined_train.json')
    ap.add_argument('--output',
                    default='outputs/calibration/ncdb_metadata.csv')
    ap.add_argument('--variants', nargs='+', default=None,
                    help='depth folder search order (default: {})'.format(
                        ' '.join(DEPTH_VARIANTS)))
    args = ap.parse_args(argv)

    rows, skipped = analyze_split(args.dataset_root, args.split_file,
                                  args.variants)
    summarize(rows, skipped)
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, 'w', newline='') as f:
        writer = csv.DictWriter(f, fieldnames=CSV_FIELDS)
        writer.writeheader()
        writer.writerows(rows)
    print('wrote {}'.format(out))


if __name__ == '__main__':
    main()
