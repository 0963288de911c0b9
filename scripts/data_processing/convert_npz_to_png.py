"""
Convert npz/npy depth maps to 16-bit PNG (depth * 256 convention)
(reference: scripts/data_processing/convert_npz_to_separate_dirs.py,
convert_fp32_npy_to_png.py — .npy inputs accept the [1,1,H,W] raw
model-dump shapes that tool handles).

Usage:
    python scripts/data_processing/convert_npz_to_png.py \
        --input npz_dir_or_file --output png_dir [--key depth] \
        [--resize H W] [--also-viz]

npz key resolution: --key, else 'depth', 'velodyne_depth', or the first
array in the file. --resize uses the sparse-preserving scatter (valid points
survive; no interpolation across holes — reference augmentations.py:58-100).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
from PIL import Image


def load_depth_npz(path, key=None):
    data = np.load(path)
    if path.endswith('.npy'):
        # raw fp32 dump (reference convert_fp32_npy_to_png.py): allow
        # [1,1,H,W] / [1,H,W] model-output shapes
        return np.squeeze(data).astype(np.float32)
    if key and key in data:
        return data[key].astype(np.float32)
    for k in ('depth', 'velodyne_depth'):
        if k in data:
            return data[k].astype(np.float32)
    return data[list(data.keys())[0]].astype(np.float32)


def convert_one(src, dst, key=None, resize=None, also_viz=False):
    depth = load_depth_npz(src, key)
    if depth.ndim == 3:
        depth = depth[..., 0]
    if resize:
        from packnet_sfm_tpu.datasets.transforms import resize_depth_preserve
        depth = resize_depth_preserve(depth[..., None], tuple(resize))[..., 0]
    png = np.clip(depth * 256.0, 0, 65535).astype(np.uint16)
    os.makedirs(os.path.dirname(dst) or '.', exist_ok=True)
    Image.fromarray(png).save(dst)
    if also_viz:
        from packnet_sfm_tpu.utils.viz import viz_inv_depth
        inv = np.where(depth > 0, 1.0 / np.maximum(depth, 1e-6), 0.0)
        viz = (viz_inv_depth(inv) * 255).astype(np.uint8)
        Image.fromarray(viz).save(dst.replace('.png', '_viz.png'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True)
    ap.add_argument('--output', required=True)
    ap.add_argument('--key', default=None)
    ap.add_argument('--resize', type=int, nargs=2, default=None)
    ap.add_argument('--also-viz', action='store_true')
    args = ap.parse_args()

    if os.path.isfile(args.input):
        files = [args.input]
    else:
        files = sorted(
            glob.glob(os.path.join(args.input, '**', '*.npz'),
                      recursive=True) +
            glob.glob(os.path.join(args.input, '**', '*.npy'),
                      recursive=True))
    print('converting {} npz files'.format(len(files)))
    for f in files:
        rel = os.path.relpath(f, args.input) if os.path.isdir(args.input) \
            else os.path.basename(f)
        dst = os.path.join(args.output, os.path.splitext(rel)[0] + '.png')
        convert_one(f, dst, args.key, args.resize, args.also_viz)
    print('done -> {}'.format(args.output))


if __name__ == '__main__':
    main()
