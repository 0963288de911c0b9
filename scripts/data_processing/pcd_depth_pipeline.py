"""
Integrated PCD -> GT depth-map pipeline for NCDB ("newest" depth maps).

This is the offline ground-truth generator behind the reference's NCDB
numbers: raw lidar clouds are densified with synthetic road-ring points
before projection, so the sparse GT covers the road surface
(reference: scripts/refrence_code/integrated_pcd_depth_pipeline_newest.py —
closest-line ground extraction :36-209, c-circle synthesis :211-362,
driver/outputs :978-1327).

Stages, re-expressed vectorized (no open3d; scipy cKDTree for the XY
separation filter):
  1. load cloud (.pcd ascii / .npz / .bin), drop the front strip (x >= 0);
  2. ground band (z in [z_min, z_max], ring r_xy in (min_dist, max_dist),
     x <= 0) -> closest point per 1-degree azimuth bin by 3D distance
     ("closest line" — a road-boundary estimate);
  3. pick the "anchor" point (closest 3D with |y| <= band, x <= 0), build a
     tilted ring basis from it, and synthesize concentric road rings
     (radii spaced linear/near/cosine along the anchor range), keeping
     x <= 0 arcs and dropping ring points within xy_sep of a real point;
  4. merge rings with the original cloud and project both the merged and
     the synthetic-only clouds through the VADAS fisheye model to 16-bit
     depth PNGs (meters*256), plus an optional colormap visualization and
     an optional resized (e.g. 640x384) mirror tree.

Output tree mirrors the reference's rule-named folders:
    <base>/newest_pcd/<stem>.npz            merged cloud
    <base>/newest_depth_maps/<stem>.png     merged-projection GT
    <base>/newest_synthetic_depth_maps/<stem>.png
    <base>/newest_colormap/<stem>_colorized.png      (--viz)
    <base>/<WxH>_newest/...                          (--resized W H)

Usage:
    python scripts/data_processing/pcd_depth_pipeline.py --input /data/seq1
        [--image_size 1920 1536] [--resized 640 384] [--viz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from project_lidar_ncdb import a6_world2cam, lidar_to_depth, load_points


def load_cloud(path):
    """Point cloud from .pcd (ascii), .npz ('points') or .bin (KITTI)."""
    if path.endswith('.pcd'):
        pts, started = [], False
        with open(path, 'r', encoding='utf-8', errors='ignore') as f:
            for line in f:
                if started:
                    parts = line.split()
                    if len(parts) >= 3:
                        try:
                            pts.append([float(parts[0]), float(parts[1]),
                                        float(parts[2])])
                        except ValueError:
                            continue
                elif line.startswith('DATA'):
                    if 'ascii' not in line:
                        raise ValueError('only ascii .pcd supported: ' + path)
                    started = True
        return np.asarray(pts, np.float64).reshape(-1, 3)
    return load_points(path)


def closest_line(points, z_range=(-3.0, 0.0), xy_dist=(2.0, 10.0),
                 angular_res_deg=1.0):
    """Closest ground point per azimuth bin by 3D distance.

    Ground candidates: z strictly inside z_range, xy radius strictly inside
    xy_dist, x <= 0 (the A6 camera looks along -X). Returns [M, 3]."""
    z, r_xy = points[:, 2], np.hypot(points[:, 0], points[:, 1])
    keep = ((z > z_range[0]) & (z < z_range[1]) &
            (r_xy > xy_dist[0]) & (r_xy < xy_dist[1]) &
            (points[:, 0] <= 0.0))
    ground = points[keep]
    if ground.shape[0] == 0:
        return np.zeros((0, 3))
    n_bins = int(round(360.0 / angular_res_deg))
    ang = np.arctan2(ground[:, 1], ground[:, 0])
    bins = ((ang + np.pi) / (2 * np.pi) * (n_bins - 1)).astype(np.int64)
    dist = np.linalg.norm(ground, axis=1)
    # first index per bin after (bin, dist) sort = per-bin argmin
    order = np.lexsort((dist, bins))
    first = np.unique(bins[order], return_index=True)[1]
    return ground[order[first]]


def ring_radii(anchor_range, n_radii=20, distribution='linear',
               near_bias=1.0, min_first=0.0, skip_far=0):
    """Ring radii along [0, anchor_range] with optional near-biased or
    cosine spacing; drop radii < min_first and the skip_far outermost."""
    if anchor_range <= 0 or n_radii <= 0:
        return np.zeros((0,))
    t = np.linspace(0.0, 1.0, n_radii + 1)[1:]
    if distribution == 'near' and abs(near_bias - 1.0) > 1e-9:
        t = t ** near_bias
    elif distribution == 'cosine':
        t = (1.0 - np.cos(np.pi * t)) * 0.5
    radii = t * anchor_range
    radii = radii[radii >= min_first]
    return radii[:len(radii) - skip_far] if skip_far > 0 else radii


def synth_road_rings(points, y_band=0.01, center_z=-1.0, n_radii=20,
                     circle_segs=200, distribution='linear', near_bias=1.0,
                     min_first=0.0, skip_far=0, xy_sep=0.0):
    """Concentric road rings anchored to the closest |y|<=band, x<=0 point.

    The ring plane tilts with the anchor: basis u_elev follows the anchor's
    azimuth with slope (z_a - center_z) / r_xy(a), u_tan is horizontal and
    perpendicular. Rings are centered at (0, 0, center_z); only x <= 0 arc
    points are kept, and (with xy_sep > 0) points within xy_sep of a real
    cloud point in XY are dropped."""
    pts = np.asarray(points, np.float64)
    cand = pts[(np.abs(pts[:, 1]) <= y_band) & (pts[:, 0] <= 0.0)]
    if cand.shape[0] == 0:
        return np.zeros((0, 3))
    d = np.linalg.norm(cand, axis=1)
    cand, d = cand[d > 0], d[d > 0]
    if cand.shape[0] == 0:
        return np.zeros((0, 3))
    anchor = cand[np.argmin(d)]

    center = np.array([0.0, 0.0, center_z])
    anchor_range = float(np.linalg.norm(anchor - center))
    b_len = max(float(np.hypot(anchor[0], anchor[1])), 1e-9)
    u_b = np.array([anchor[0], anchor[1], 0.0]) / b_len
    u_tan = np.cross([0.0, 0.0, 1.0], u_b)
    u_elev = u_b + ((anchor[2] - center_z) / b_len) * np.array([0., 0., 1.])
    u_elev /= max(np.linalg.norm(u_elev), 1e-9)

    radii = ring_radii(anchor_range, n_radii, distribution, near_bias,
                       min_first, skip_far)
    # the ring through the anchor itself duplicates real geometry
    radii = radii[np.abs(radii - anchor_range) >
                  np.maximum(1e-9, 1e-6 * anchor_range)]
    if radii.size == 0:
        return np.zeros((0, 3))

    t = np.linspace(0.0, 2 * np.pi, circle_segs)
    arc = (np.cos(t)[:, None] * u_elev[None, :] +
           np.sin(t)[:, None] * u_tan[None, :])        # [S, 3]
    rings = center[None, None] + radii[:, None, None] * arc[None]
    rings = rings.reshape(-1, 3)
    rings = rings[rings[:, 0] <= 0.0]
    if xy_sep > 0.0 and rings.shape[0] and pts.shape[0]:
        from scipy.spatial import cKDTree
        tree = cKDTree(pts[:, :2])
        dist, _ = tree.query(rings[:, :2], k=1)
        rings = rings[dist >= xy_sep]
    return rings


def save_depth_png(depth, path):
    import warnings
    from PIL import Image
    arr16 = np.clip(depth * 256.0, 0, 65535).astype(np.uint16)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        Image.fromarray(arr16, mode='I;16').save(path)


def save_colormap(depth, path, max_depth):
    from packnet_sfm_tpu.utils.viz import viz_inv_depth
    from PIL import Image
    shown = np.where(depth > 0, depth, max_depth)
    panel = (viz_inv_depth(1.0 / np.maximum(shown, 1e-3)) * 255
             ).astype(np.uint8)
    panel[depth == 0] = 255
    Image.fromarray(panel).save(path)


def resize_depth_nn(depth, size):
    """Sparse-preserving nearest-valid downsample: keep each target cell's
    nearest return (matches datasets/transforms resize_depth_preserve)."""
    W, H = size
    h, w = depth.shape
    v, u = np.nonzero(depth > 0)
    if v.size == 0:
        return np.zeros((H, W), np.float32)
    z = depth[v, u]
    vv = np.minimum((v * H / h).astype(int), H - 1)
    uu = np.minimum((u * W / w).astype(int), W - 1)
    out = np.zeros((H, W), np.float32)
    order = np.argsort(-z)
    out[vv[order], uu[order]] = z[order]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True,
                    help="folder containing a 'pcd' subfolder, the pcd "
                         "folder itself, or a folder of cloud files")
    ap.add_argument('--image_size', type=int, nargs=2, default=[1920, 1536])
    ap.add_argument('--max_depth', type=float, default=100.0)
    ap.add_argument('--ground_z', type=float, nargs=2, default=[-3.0, 0.0])
    ap.add_argument('--xy_dist', type=float, nargs=2, default=[2.0, 10.0])
    ap.add_argument('--center_z', type=float, default=-1.0)
    ap.add_argument('--n_radii', type=int, default=20)
    ap.add_argument('--circle_segs', type=int, default=200)
    ap.add_argument('--distribution', default='linear',
                    choices=['linear', 'near', 'cosine'])
    ap.add_argument('--near_bias', type=float, default=1.0)
    ap.add_argument('--min_first_radius', type=float, default=0.0)
    ap.add_argument('--skip_far', type=int, default=0)
    ap.add_argument('--xy_sep', type=float, default=0.0)
    ap.add_argument('--no_merge_original', action='store_true',
                    help='project only the synthetic rings')
    ap.add_argument('--resized', type=int, nargs=2, default=None,
                    help='also emit a <WxH>_newest mirror tree')
    ap.add_argument('--viz', action='store_true')
    ap.add_argument('--limit', type=int, default=0)
    args = ap.parse_args(argv)

    from packnet_sfm_tpu.datasets.ncdb import (
        DEFAULT_CALIB_A6, DEFAULT_LIDAR_TO_WORLD)

    base = args.input
    pcd_dir = base
    if os.path.isdir(os.path.join(base, 'pcd')):
        pcd_dir = os.path.join(base, 'pcd')
    elif os.path.basename(os.path.normpath(base)).lower() == 'pcd':
        base = os.path.dirname(os.path.normpath(base))

    files = sorted(f for f in os.listdir(pcd_dir)
                   if f.endswith(('.pcd', '.npz', '.bin')))
    if args.limit:
        files = files[:args.limit]
    if not files:
        print('no cloud files in ' + pcd_dir, file=sys.stderr)
        return 1

    intr = np.asarray(DEFAULT_CALIB_A6['intrinsic'], np.float64)
    world2cam = a6_world2cam()

    trees = [(base, tuple(args.image_size))]
    if args.resized:
        trees.append((os.path.join(
            base, '{}x{}_newest'.format(*args.resized)),
            tuple(args.resized)))
    for root, _ in trees:
        for sub in ('newest_pcd', 'newest_depth_maps',
                    'newest_synthetic_depth_maps', 'newest_colormap'):
            os.makedirs(os.path.join(root, sub), exist_ok=True)

    for fname in files:
        stem = os.path.splitext(fname)[0]
        cloud = load_cloud(os.path.join(pcd_dir, fname))
        cloud = cloud[cloud[:, 0] < 0.0]  # front strip excluded at load
        line = closest_line(cloud, tuple(args.ground_z),
                            tuple(args.xy_dist))
        rings = synth_road_rings(
            cloud, center_z=args.center_z, n_radii=args.n_radii,
            circle_segs=args.circle_segs, distribution=args.distribution,
            near_bias=args.near_bias, min_first=args.min_first_radius,
            skip_far=args.skip_far, xy_sep=args.xy_sep)
        merged = rings if args.no_merge_original else (
            np.concatenate([cloud, rings]) if rings.size else cloud)

        depth = lidar_to_depth(merged, world2cam, DEFAULT_LIDAR_TO_WORLD,
                              intr, tuple(args.image_size), args.max_depth)
        synth = lidar_to_depth(rings, world2cam, DEFAULT_LIDAR_TO_WORLD,
                              intr, tuple(args.image_size), args.max_depth)

        np.savez_compressed(
            os.path.join(base, 'newest_pcd', stem + '.npz'),
            points=merged.astype(np.float32),
            n_original=np.int64(0 if args.no_merge_original
                                else cloud.shape[0]),
            closest_line=line.astype(np.float32))
        for root, size in trees:
            d = depth if size == tuple(args.image_size) \
                else resize_depth_nn(depth, size)
            s = synth if size == tuple(args.image_size) \
                else resize_depth_nn(synth, size)
            save_depth_png(d, os.path.join(
                root, 'newest_depth_maps', stem + '.png'))
            save_depth_png(s, os.path.join(
                root, 'newest_synthetic_depth_maps', stem + '.png'))
            if args.viz:
                save_colormap(d, os.path.join(
                    root, 'newest_colormap', stem + '_colorized.png'),
                    args.max_depth)
        print('{}: {} pts (+{} synth) -> {} gt px'.format(
            stem, cloud.shape[0], rings.shape[0],
            int((depth > 0).sum())))
    print('pipeline done: {} clouds -> {}'.format(len(files), base))
    return 0


if __name__ == '__main__':
    sys.exit(main())
