"""
Projected-LiDAR pixels vs prediction: overlay the sparse GT depth pixels on
the predicted depth map colored by signed error, plus a GT-vs-pred scatter
with metric stats (reference:
scripts/visualization/visualize_projected_depth_pixels_vs_pred.py — the
tool used to diagnose LiDAR-projection/prediction misalignment on NCDB).

Inputs: a prediction (npz/npy/png*256) and a sparse GT depth map; optional
RGB underlay. Outputs <stem>_overlay.png and <stem>_scatter.png.

Usage:
    python scripts/visualization/lidar_vs_pred.py --pred pred.npz \
        --gt gt.png [--image rgb.png] --output out_dir \
        [--min_depth 0.5] [--max_depth 15]
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


def overlay_panel(pred, gt, rgb, min_depth, max_depth):
    """Predicted-depth colormap (or RGB) with GT pixels colored by signed
    relative error: blue = pred too near, red = pred too far."""
    from packnet_sfm_tpu.utils.viz import viz_inv_depth
    H, W = pred.shape
    if rgb is not None:
        base = (np.asarray(rgb, np.float32) / 255.0)[..., :3]
    else:
        base = viz_inv_depth(1.0 / np.maximum(pred, 1e-6))
    out = base.copy()
    valid = (gt > min_depth) & (gt < max_depth)
    err = np.zeros_like(pred)
    err[valid] = (pred[valid] - gt[valid]) / gt[valid]
    # signed error -> color: clip to +-0.5 rel error
    e = np.clip(err / 0.5, -1.0, 1.0)
    color = np.stack([np.maximum(e, 0),                 # red: too far
                      1.0 - np.abs(e),                  # green: accurate
                      np.maximum(-e, 0)], -1)           # blue: too near
    # dilate GT pixels 3x3 so they are visible
    ys, xs = np.nonzero(valid)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy = np.clip(ys + dy, 0, H - 1)
            xx = np.clip(xs + dx, 0, W - 1)
            out[yy, xx] = color[ys, xs]
    return (out * 255).astype(np.uint8), err, valid


def scatter_panel(pred, gt, valid, max_depth, path):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    g, p = gt[valid], pred[valid]
    abs_rel = float(np.mean(np.abs(p - g) / g)) if g.size else float('nan')
    rmse = float(np.sqrt(np.mean((p - g) ** 2))) if g.size else float('nan')
    fig, ax = plt.subplots(figsize=(5, 5), dpi=110)
    ax.scatter(g, p, s=2, alpha=0.3, linewidths=0)
    ax.plot([0, max_depth], [0, max_depth], 'r--', lw=1)
    ax.set_xlim(0, max_depth)
    ax.set_ylim(0, max_depth)
    ax.set_xlabel('GT depth [m]')
    ax.set_ylabel('Predicted depth [m]')
    ax.set_title('n={} abs_rel={:.4f} rmse={:.3f}'.format(
        g.size, abs_rel, rmse))
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return abs_rel, rmse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pred', required=True)
    ap.add_argument('--gt', required=True)
    ap.add_argument('--image', default=None)
    ap.add_argument('--output', required=True)
    ap.add_argument('--min_depth', type=float, default=0.0)
    ap.add_argument('--max_depth', type=float, default=80.0)
    a = ap.parse_args()

    pred = load_depth_any(a.pred)
    gt = load_depth_any(a.gt)
    assert pred.shape == gt.shape, (pred.shape, gt.shape)
    rgb = Image.open(a.image).convert('RGB') if a.image else None
    if rgb is not None and rgb.size != (pred.shape[1], pred.shape[0]):
        rgb = rgb.resize((pred.shape[1], pred.shape[0]), Image.LANCZOS)

    os.makedirs(a.output, exist_ok=True)
    stem = os.path.splitext(os.path.basename(a.pred))[0]
    panel, err, valid = overlay_panel(pred, gt, rgb, a.min_depth, a.max_depth)
    Image.fromarray(panel).save(
        os.path.join(a.output, stem + '_overlay.png'))
    abs_rel, rmse = scatter_panel(
        pred, gt, valid, a.max_depth,
        os.path.join(a.output, stem + '_scatter.png'))
    print('{}: {} GT px | abs_rel {:.4f} | rmse {:.3f} | '
          'mean signed rel err {:+.4f}'.format(
              stem, int(valid.sum()), abs_rel, rmse,
              float(err[valid].mean()) if valid.any() else float('nan')))


if __name__ == '__main__':
    main()
