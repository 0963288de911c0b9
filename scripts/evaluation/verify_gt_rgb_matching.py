"""
Verify GT depth / RGB correspondence for a dataset tree
(reference: scripts/evaluation/verify_gt_rgb_matching.py — SURVEY.md §2.14):
checks stem-level pairing, resolutions, depth value sanity and valid-pixel
density; prints a summary and exits nonzero on mismatches.

Usage:
    python scripts/evaluation/verify_gt_rgb_matching.py
        --rgb_dir data/image_a6 --depth_dir data/newest_original_depth_maps
        [--min_valid_fraction 0.001] [--max_depth 200]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--rgb_dir', required=True)
    p.add_argument('--depth_dir', required=True)
    p.add_argument('--min_valid_fraction', type=float, default=0.001)
    p.add_argument('--max_depth', type=float, default=200.0)
    p.add_argument('--limit', type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    from packnet_sfm_tpu.datasets.io import load_image, load_depth

    rgb_stems = {os.path.splitext(f)[0]: f for f in os.listdir(args.rgb_dir)
                 if f.lower().endswith(('.png', '.jpg'))}
    d_stems = {os.path.splitext(f)[0]: f for f in os.listdir(args.depth_dir)
               if f.endswith(('.png', '.npz'))}

    only_rgb = sorted(set(rgb_stems) - set(d_stems))
    only_depth = sorted(set(d_stems) - set(rgb_stems))
    common = sorted(set(rgb_stems) & set(d_stems))
    print('pairs: {} | rgb-only: {} | depth-only: {}'.format(
        len(common), len(only_rgb), len(only_depth)))
    for s in only_rgb[:5]:
        print('  missing depth for', s)
    for s in only_depth[:5]:
        print('  missing rgb for', s)

    bad = 0
    checked = common if not args.limit else common[:args.limit]
    for stem in checked:
        rgb = load_image(os.path.join(args.rgb_dir, rgb_stems[stem]))
        depth = load_depth(os.path.join(args.depth_dir, d_stems[stem]))
        problems = []
        if rgb.shape[:2] != depth.shape[:2]:
            problems.append('resolution {} vs {}'.format(rgb.shape[:2],
                                                         depth.shape[:2]))
        valid = depth > 0
        if valid.mean() < args.min_valid_fraction:
            problems.append('only {:.4%} valid depth'.format(valid.mean()))
        if valid.any() and depth[valid].max() > args.max_depth:
            problems.append('max depth {:.1f} > {}'.format(
                depth[valid].max(), args.max_depth))
        if problems:
            bad += 1
            print('BAD {}: {}'.format(stem, '; '.join(problems)))
    print('checked {}, bad {}'.format(len(checked), bad))
    sys.exit(1 if (bad or only_rgb or only_depth) else 0)


if __name__ == '__main__':
    main()
