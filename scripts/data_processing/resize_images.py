"""
Batch-resize an image / depth tree (reference:
scripts/data_processing/resize_images.py).

RGB is resized with LANCZOS (the reference's choice for eval-quality
downsampling); 16-bit depth PNGs use the sparse-preserving scatter so valid
lidar points survive without interpolation across holes.

Usage:
    python scripts/data_processing/resize_images.py \
        --input in_dir --output out_dir --shape H W [--depth]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True)
    ap.add_argument('--output', required=True)
    ap.add_argument('--shape', type=int, nargs=2, required=True,
                    metavar=('H', 'W'))
    ap.add_argument('--depth', action='store_true',
                    help='treat PNGs as 16-bit depth maps (sparse scatter)')
    args = ap.parse_args()

    H, W = args.shape
    exts = ('*.png', '*.jpg', '*.jpeg')
    files = []
    for e in exts:
        files += glob.glob(os.path.join(args.input, '**', e), recursive=True)
    files = sorted(files)
    print('resizing {} files to {}x{}'.format(len(files), H, W))
    for f in files:
        rel = os.path.relpath(f, args.input)
        dst = os.path.join(args.output, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        img = Image.open(f)
        if args.depth or (img.mode in ('I', 'I;16') and f.endswith('.png')):
            from packnet_sfm_tpu.datasets.transforms import \
                resize_depth_preserve
            depth = np.asarray(img, np.float32) / 256.0
            out = resize_depth_preserve(depth[..., None], (H, W))[..., 0]
            Image.fromarray((out * 256.0).astype(np.uint16)).save(dst)
        else:
            img.convert('RGB').resize((W, H), Image.LANCZOS).save(dst)
    print('done -> {}'.format(args.output))


if __name__ == '__main__':
    main()
