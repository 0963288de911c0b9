"""
Masked-prediction visualization: apply a validity mask (e.g. the NCDB
fisheye self-occlusion mask) to a predicted depth map and render
rgb | raw prediction | masked prediction panels, reporting the masked
depth statistics (reference:
scripts/visualization/visualize_masked_prediction.py — used to check that
the fisheye body-occlusion mask is applied consistently between training
and NPU deployment).

Usage:
    python scripts/visualization/visualize_masked_prediction.py \
        --image rgb.png --pred pred.npz --mask mask.png --output out.png \
        [--max_depth 15]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np
from PIL import Image


def load_depth_any(path):
    if path.endswith('.npy'):
        return np.squeeze(np.load(path)).astype(np.float32)
    if path.endswith('.npz'):
        d = np.load(path)
        key = 'depth' if 'depth' in d else list(d.keys())[0]
        return np.squeeze(d[key]).astype(np.float32)
    return np.asarray(Image.open(path), np.float32) / 256.0


def load_mask(path, shape):
    m = np.asarray(Image.open(path).convert('L'), np.float32)
    if m.shape != shape:
        m = np.asarray(
            Image.fromarray(m).resize((shape[1], shape[0]), Image.NEAREST),
            np.float32)
    return (m > 127).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--image', required=True)
    ap.add_argument('--pred', required=True)
    ap.add_argument('--mask', required=True)
    ap.add_argument('--output', required=True)
    ap.add_argument('--max_depth', type=float, default=15.0)
    a = ap.parse_args()

    from packnet_sfm_tpu.utils.viz import viz_inv_depth

    pred = load_depth_any(a.pred)
    mask = load_mask(a.mask, pred.shape)
    rgb = Image.open(a.image).convert('RGB')
    if rgb.size != (pred.shape[1], pred.shape[0]):
        rgb = rgb.resize((pred.shape[1], pred.shape[0]), Image.LANCZOS)
    rgb = np.asarray(rgb, np.float32) / 255.0

    inv = 1.0 / np.maximum(pred, 1e-6)
    raw_viz = viz_inv_depth(inv)
    masked_viz = raw_viz * mask[..., None] + 0.15 * rgb * (1 - mask[..., None])
    panel = np.concatenate([rgb, raw_viz, masked_viz], axis=1)

    os.makedirs(os.path.dirname(a.output) or '.', exist_ok=True)
    Image.fromarray((panel * 255).astype(np.uint8)).save(a.output)

    valid = mask > 0
    d = pred[valid]
    print('masked region: {:.1%} of image | depth min {:.2f} mean {:.2f} '
          'max {:.2f} (clip {:.1f}) -> {}'.format(
              float(valid.mean()), float(d.min()) if d.size else 0.0,
              float(d.mean()) if d.size else 0.0,
              float(d.max()) if d.size else 0.0, a.max_depth, a.output))


if __name__ == '__main__':
    main()
