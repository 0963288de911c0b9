"""
LiDAR -> VADAS-fisheye-camera projection and depth-map creation for NCDB
(reference: scripts/refrence_code/ref_camera_lidar_projector.py,
create_depth_maps.py — SURVEY.md §2.14).

Reads point clouds (.npz with 'points' [N,3] or .bin KITTI-style float32
[N,4]), transforms lidar -> world -> camera with the NCDB calibration, and
renders 16-bit depth PNGs (meters * 256) into a rule-named folder.

Projection follows the OFFLINE GT convention (the one that generated the
reference's depth-map folders): +X-forward camera, Rodrigues extrinsic,
r_d = poly(theta*s)/div with a center-offset principal point, depth =
forward distance Xc, per-pixel min-Xc occlusion. The training-time
FisheyeCamera (+Z forward, raw principal point) lives in
geometry/camera.py and is golden-tested separately — the two conventions
are NOT interchangeable.

Usage:
    python scripts/data_processing/project_lidar_ncdb.py --root /data/ncdb
        --lidar_dir synced_data/lidar --image_dir synced_data/image_a6
        --out_folder newest_original_depth_maps [--max_depth 100]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--root', required=True)
    p.add_argument('--lidar_dir', required=True)
    p.add_argument('--image_dir', required=True)
    p.add_argument('--out_folder', default='newest_original_depth_maps')
    p.add_argument('--max_depth', type=float, default=100.0)
    return p.parse_args()


def load_points(path):
    if path.endswith('.npz'):
        data = np.load(path)
        key = 'points' if 'points' in data else list(data.keys())[0]
        return np.asarray(data[key])[:, :3].astype(np.float64)
    if path.endswith('.bin'):
        return np.fromfile(path, np.float32).reshape(-1, 4)[:, :3].astype(
            np.float64)
    raise ValueError('Unsupported point cloud: ' + path)


def rodrigues_to_mat(rvec):
    """Axis-angle -> rotation matrix (offline calib convention —
    reference: integrated_pcd_depth_pipeline_newest.py:457-466)."""
    rvec = np.asarray(rvec, np.float64)
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3)
    k = rvec / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def vadas_project_offline(cam, intr, W, H, ref_size=(1920, 1536)):
    """Offline VADAS projection of camera-frame points [N, 3] -> integer
    pixel coords + forward-distance depth + validity.

    +X forward; phi from (-Y, -Z); r_d = poly7(theta * s) / div; pixel =
    r_d * (cos, sin)phi + (ux, uy) + image center. Intrinsics auto-rescale
    from ref_size for smaller renders (ux*sx, uy*sy, div/sx — reference:
    integrated_pcd_depth_pipeline_newest.py:387-425)."""
    k = intr[0:7]
    s, div, ux, uy = intr[7], intr[8], intr[9], intr[10]
    if (W, H) != ref_size:
        sx, sy = W / ref_size[0], H / ref_size[1]
        ux, uy, div = ux * sx, uy * sy, div / sx
    Xc, Yc, Zc = cam[:, 0], cam[:, 1], cam[:, 2]
    nx, ny = -Yc, -Zc
    dist = np.maximum(np.hypot(nx, ny), np.finfo(np.float64).eps)
    cos_phi, sin_phi = nx / dist, ny / dist
    theta = np.arctan2(dist, Xc)
    xd = theta * s
    rd = np.zeros_like(xd)
    for i in range(6, -1, -1):
        rd = rd * xd + k[i]
    rd = rd / div
    u = np.round(rd * cos_phi + ux + W / 2).astype(np.int64)
    v = np.round(rd * sin_phi + uy + H / 2).astype(np.int64)
    valid = ((Xc > 0) & np.isfinite(rd) &
             (u >= 0) & (u < W) & (v >= 0) & (v < H))
    return u, v, Xc, valid


def lidar_to_depth(points, world2cam, lidar2world, intr, size, max_depth):
    """Lidar-frame points [N, 3] -> [H, W] forward-distance depth map
    (0 = no return); per-pixel occlusion keeps the nearest point."""
    W, H = size
    if points.shape[0] == 0:
        return np.zeros((H, W), np.float32)
    world = (lidar2world[:3, :3] @ points.T + lidar2world[:3, 3:4]).T
    cam = (world2cam[:3, :3] @ world.T + world2cam[:3, 3:4]).T
    u, v, z, valid = vadas_project_offline(cam, intr, W, H)
    u, v, z = u[valid], v[valid], np.clip(z[valid], 0, max_depth)
    depth = np.zeros((H, W), np.float32)
    order = np.argsort(-z)  # near overwrites far = min-Xc occlusion
    depth[v[order], u[order]] = z[order]
    return depth


def a6_world2cam():
    from packnet_sfm_tpu.datasets.ncdb import DEFAULT_CALIB_A6
    ext = np.asarray(DEFAULT_CALIB_A6['extrinsic'], np.float64)
    world2cam = np.eye(4)
    world2cam[:3, :3] = rodrigues_to_mat(ext[3:6])
    world2cam[:3, 3] = ext[:3]
    return world2cam


def main():
    args = parse_args()
    from packnet_sfm_tpu.datasets.ncdb import (
        DEFAULT_CALIB_A6, DEFAULT_LIDAR_TO_WORLD)
    from packnet_sfm_tpu.datasets.io import load_image
    from PIL import Image

    intr = np.asarray(DEFAULT_CALIB_A6['intrinsic'], np.float64)
    world2cam = a6_world2cam()

    lidar_dir = os.path.join(args.root, args.lidar_dir)
    image_dir = os.path.join(args.root, args.image_dir)
    out_dir = os.path.join(os.path.dirname(image_dir), args.out_folder)
    os.makedirs(out_dir, exist_ok=True)

    clouds = sorted(f for f in os.listdir(lidar_dir)
                    if f.endswith(('.npz', '.bin')))
    done = 0
    for f in clouds:
        stem = os.path.splitext(f)[0]
        img_path = os.path.join(image_dir, stem + '.png')
        if not os.path.exists(img_path):
            continue
        H, W = load_image(img_path).shape[:2]
        pts = load_points(os.path.join(lidar_dir, f))
        # exclude the ego-vehicle front strip (reference projector filter)
        strip = ((pts[:, 1] <= 0.5) & (pts[:, 1] >= -0.7) &
                 (pts[:, 0] >= 0.0))
        depth = lidar_to_depth(pts[~strip], world2cam,
                               DEFAULT_LIDAR_TO_WORLD, intr, (W, H),
                               args.max_depth)
        arr16 = np.clip(depth * 256.0, 0, 65535).astype(np.uint16)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            Image.fromarray(arr16, mode='I;16').save(
                os.path.join(out_dir, stem + '.png'))
        done += 1
        if done % 100 == 0:
            print(done, 'done')
    print('projected {} clouds -> {}'.format(done, out_dir))


if __name__ == '__main__':
    main()
