"""
Video-sequence projection overlay for NCDB: project each frame's point
cloud through the VADAS fisheye model and render it over the RGB, side by
side with an optional predicted/NPU depth overlay, then assemble the
per-frame panels into an mp4 (reference:
scripts/visualization/visualize_ncdb_video_projection.py — GT-vs-NPU
depth overlays on video frames via the offline projection convention).

Frames and clouds are matched by stem; prediction dumps (npz/npy/png*256)
are optional. Panels: [RGB + cloud scatter | RGB + prediction overlay]
(single panel when no --pred given).

Usage:
    python scripts/visualization/video_projection.py \
        --images seq/rgb --clouds seq/lidar [--pred seq/npu] \
        --output out_dir [--video out.mp4 --fps 10] [--max_depth 30]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', 'data_processing'))

import numpy as np

from project_lidar_ncdb import a6_world2cam, lidar_to_depth, load_points


def load_pred(path):
    from PIL import Image
    if path.endswith('.npy'):
        return np.squeeze(np.load(path)).astype(np.float32)
    if path.endswith('.npz'):
        d = np.load(path)
        key = 'depth' if 'depth' in d else list(d.keys())[0]
        return np.squeeze(d[key]).astype(np.float32)
    return np.asarray(Image.open(path), np.float32) / 256.0


def find_by_stem(dirname, stem, exts):
    for ext in exts:
        p = os.path.join(dirname, stem + ext)
        if os.path.exists(p):
            return p
    return None


def depth_overlay(rgb, depth, max_depth, dilate=1, alpha=0.85):
    """Scatter a sparse depth map over the RGB, colored by inverse depth."""
    from packnet_sfm_tpu.utils.viz import apply_colormap
    panel = rgb.copy()
    mask = depth > 0
    if dilate > 1:
        # grow each return to a (dilate x dilate) block for visibility
        v, u = np.nonzero(mask)
        z = depth[mask]
        H, W = depth.shape
        off = np.arange(dilate) - dilate // 2
        shape = (v.size, dilate, dilate)
        vv = np.broadcast_to(
            np.clip(v[:, None, None] + off[None, :, None], 0, H - 1), shape)
        uu = np.broadcast_to(
            np.clip(u[:, None, None] + off[None, None, :], 0, W - 1), shape)
        grown = np.zeros_like(depth)
        grown[vv.reshape(-1), uu.reshape(-1)] = \
            np.repeat(z, dilate * dilate)
        depth, mask = grown, grown > 0
    inv = np.where(mask, 1.0 / np.maximum(depth, 1e-3), 0.0)
    colors = apply_colormap(inv * max_depth / 10.0)
    panel[mask] = (alpha * colors[mask] * 255 +
                   (1 - alpha) * panel[mask]).astype(np.uint8)
    return panel


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', required=True)
    ap.add_argument('--clouds', default='',
                    help='point-cloud dir (.npz/.bin); omit to only '
                         'overlay --pred')
    ap.add_argument('--pred', default='',
                    help='prediction dump dir (npz/npy/png*256)')
    ap.add_argument('--output', required=True)
    ap.add_argument('--video', default='',
                    help='also write an mp4 of the panels')
    ap.add_argument('--fps', type=int, default=10)
    ap.add_argument('--max_depth', type=float, default=30.0)
    ap.add_argument('--dilate', type=int, default=3)
    ap.add_argument('--limit', type=int, default=0)
    args = ap.parse_args(argv)
    if not args.clouds and not args.pred:
        ap.error('need --clouds and/or --pred')

    from PIL import Image
    from packnet_sfm_tpu.datasets.ncdb import (
        DEFAULT_CALIB_A6, DEFAULT_LIDAR_TO_WORLD)

    intr = np.asarray(DEFAULT_CALIB_A6['intrinsic'], np.float64)
    world2cam = a6_world2cam()

    frames = sorted(
        f for f in glob.glob(os.path.join(args.images, '*'))
        if f.lower().endswith(('.png', '.jpg', '.jpeg')))
    if args.limit:
        frames = frames[:args.limit]
    os.makedirs(args.output, exist_ok=True)

    panel_paths = []
    for f in frames:
        stem = os.path.splitext(os.path.basename(f))[0]
        rgb = np.asarray(Image.open(f).convert('RGB'))
        H, W = rgb.shape[:2]
        panels = []
        if args.clouds:
            cpath = find_by_stem(args.clouds, stem, ('.npz', '.bin'))
            if cpath is None:
                continue
            pts = load_points(cpath)
            gt = lidar_to_depth(pts, world2cam, DEFAULT_LIDAR_TO_WORLD,
                                intr, (W, H), args.max_depth)
            panels.append(depth_overlay(rgb, gt, args.max_depth,
                                        args.dilate))
        if args.pred:
            ppath = find_by_stem(args.pred, stem, ('.npz', '.npy', '.png'))
            if ppath is not None:
                pred = load_pred(ppath)
                if pred.shape != (H, W):
                    from packnet_sfm_tpu.datasets.transforms import (
                        resize_depth)
                    pred = resize_depth(pred[..., None], (H, W))[..., 0]
                # dense prediction: blend everywhere, no dilation
                panels.append(depth_overlay(rgb, pred, args.max_depth,
                                            dilate=1, alpha=0.6))
        if not panels:
            continue
        panel = np.concatenate(panels, axis=1)
        out_path = os.path.join(args.output, stem + '.png')
        Image.fromarray(panel).save(out_path)
        panel_paths.append(out_path)

    if args.video and panel_paths:
        import cv2
        first = np.asarray(Image.open(panel_paths[0]))
        vh, vw = first.shape[:2]
        writer = cv2.VideoWriter(
            args.video, cv2.VideoWriter_fourcc(*'mp4v'), args.fps,
            (vw, vh))
        for p in panel_paths:
            writer.write(np.asarray(Image.open(p))[..., ::-1].copy())
        writer.release()
        print('video -> {}'.format(args.video))
    print('rendered {} frame panels -> {}'.format(
        len(panel_paths), args.output))
    return 0


if __name__ == '__main__':
    sys.exit(main())
