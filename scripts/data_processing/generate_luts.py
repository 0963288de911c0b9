"""
VADAS fisheye lookup-table generation for NPU/embedded deployment
(reference: scripts/refrence_code/ref_generate_luts.py — the reference
precomputes distortion LUTs for its camera/LiDAR pipeline).

Exports, for a given VADAS calibration and image size:
- theta->r_d forward polynomial table (sampled),
- r_d->theta INVERSE table (numeric inversion by dense sampling +
  monotone interpolation) — the exact counterpart of the training-time
  theta ~= r_d approximation (geometry/camera.py FisheyeCamera.reconstruct,
  reference camera.py:268), with the approximation error reported,
- a per-pixel unit-ray LUT [H, W, 3] (depth map -> point cloud on-device
  with one multiply), using the exact inverse.

Calibration comes from --calib (JSON with the NCDB 'intrinsic' layout:
[k0..k6, s, div, ux, uy, ...]) or defaults to the built-in A6 rig
(datasets/ncdb.py DEFAULT_CALIB_A6).

Usage:
    python scripts/data_processing/generate_luts.py --output luts.npz \
        [--calib calib.json] [--height 384] [--width 640] [--samples 4096]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np


def vadas_forward_rd(theta, k):
    """7-term polynomial r_d(theta) (geometry/camera.py project)."""
    rd = np.full_like(theta, k[6])
    for i in range(5, -1, -1):
        rd = rd * theta + k[i]
    return rd


def build_inverse_table(k, theta_max=np.pi / 2 * 0.98, samples=4096):
    """Dense-sample theta -> r_d, return monotone (r_d, theta) pairs for
    interpolation. Non-monotone tails (polynomial misbehaviour beyond the
    calibrated FOV) are trimmed."""
    theta = np.linspace(0.0, theta_max, samples).astype(np.float64)
    rd = vadas_forward_rd(theta, np.asarray(k, np.float64))
    # keep the maximal strictly-increasing prefix (valid invertible range)
    keep = np.concatenate([[True], np.diff(rd) > 0])
    first_bad = np.argmin(keep) if not keep.all() else len(keep)
    theta, rd = theta[:first_bad], rd[:first_bad]
    return rd.astype(np.float32), theta.astype(np.float32)


def build_ray_lut(H, W, k, s, div, ux, uy, rd_table, theta_table):
    """Per-pixel unit ray using the EXACT polynomial inverse."""
    v, u = np.meshgrid(np.arange(H, dtype=np.float64),
                       np.arange(W, dtype=np.float64), indexing='ij')
    x_dist = (u - ux) / s
    y_dist = (v - uy) / div
    r_d = np.sqrt(x_dist ** 2 + y_dist ** 2)
    theta = np.interp(r_d, rd_table, theta_table)
    r = np.tan(theta)
    r_d_safe = np.maximum(r_d, 1e-12)
    x_norm = (r / r_d_safe) * x_dist
    y_norm = (r / r_d_safe) * y_dist
    rays = np.stack([x_norm, y_norm, np.ones_like(x_norm)], -1)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    return rays.astype(np.float32), theta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--output', required=True)
    ap.add_argument('--calib', default=None,
                    help="JSON with 'intrinsic' [k0..k6, s, div, ux, uy, ...]")
    ap.add_argument('--height', type=int, default=384)
    ap.add_argument('--width', type=int, default=640)
    ap.add_argument('--samples', type=int, default=4096)
    a = ap.parse_args()

    if a.calib:
        with open(a.calib) as f:
            intr = json.load(f)['intrinsic']
    else:
        from packnet_sfm_tpu.datasets.ncdb import DEFAULT_CALIB_A6
        intr = DEFAULT_CALIB_A6['intrinsic']
    k, s, div, ux, uy = (np.asarray(intr[0:7], np.float64),
                         float(intr[7]), float(intr[8]),
                         float(intr[9]), float(intr[10]))

    rd_table, theta_table = build_inverse_table(k, samples=a.samples)
    rays, theta_px = build_ray_lut(a.height, a.width, k, s, div, ux, uy,
                                   rd_table, theta_table)

    # report the training-time theta ~= r_d approximation error over pixels
    rd_px = np.sqrt((((np.arange(a.width) - ux) / s)[None, :] ** 2) +
                    (((np.arange(a.height) - uy) / div)[:, None] ** 2))
    in_range = rd_px <= rd_table[-1]
    approx_err = np.abs(theta_px - rd_px)[in_range]
    err_txt = ('mean {:.2e} max {:.2e} rad'.format(
        float(approx_err.mean()), float(approx_err.max()))
        if approx_err.size else 'n/a (no pixels in calibrated range; '
        'out-of-range pixels clamp to the table end)')

    os.makedirs(os.path.dirname(a.output) or '.', exist_ok=True)
    np.savez_compressed(
        a.output,
        k=k.astype(np.float32), s=np.float32(s), div=np.float32(div),
        ux=np.float32(ux), uy=np.float32(uy),
        theta_samples=theta_table, rd_samples=rd_table,
        ray_lut=rays, image_size=np.asarray([a.height, a.width], np.int32))
    print('wrote {}: inverse table {} pts (r_d up to {:.4f}), ray LUT '
          '{}x{}x3; theta~=r_d approx err {} '
          '({:.1%} of pixels in calibrated range)'.format(
              a.output, len(rd_table), float(rd_table[-1]),
              a.height, a.width, err_txt, float(in_range.mean())))


if __name__ == '__main__':
    main()
