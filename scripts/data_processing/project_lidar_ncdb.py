"""
LiDAR -> VADAS-fisheye-camera projection and depth-map creation for NCDB
(reference: scripts/refrence_code/ LiDAR->camera projection, LUT generation,
depth-map creation — SURVEY.md §2.14).

Reads point clouds (.npz with 'points' [N,3] or .bin KITTI-style float32
[N,4]), transforms lidar -> world -> camera with the NCDB calibration, and
renders 16-bit depth PNGs (meters * 256) into a rule-named folder.

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


def euler_to_mat(rx, ry, rz):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def vadas_project(pts_cam, intr, W, H):
    """VADAS forward projection of camera-frame points -> pixel coords
    (math parity with geometry/camera.py FisheyeCamera.project)."""
    k = intr[0:7]
    s, div, ux, uy = intr[7], intr[8], intr[9], intr[10]
    Z = np.clip(pts_cam[:, 2], 1e-9, None)
    xn = pts_cam[:, 0] / Z
    yn = pts_cam[:, 1] / Z
    r = np.sqrt(xn ** 2 + yn ** 2)
    theta = np.arctan(r)
    poly = np.full_like(theta, k[0])
    for i in range(1, 7):
        poly = poly + k[i] * theta ** i
    r_safe = np.maximum(r, 1e-9)
    u = s * (poly / r_safe) * xn + ux
    v = div * (poly / r_safe) * yn + uy
    valid = (pts_cam[:, 2] > 0.1) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    return u.astype(int), v.astype(int), pts_cam[:, 2], valid


def main():
    args = parse_args()
    from packnet_sfm_tpu.datasets.ncdb import (
        DEFAULT_CALIB_A6, DEFAULT_LIDAR_TO_WORLD)
    from packnet_sfm_tpu.datasets.io import load_image
    from PIL import Image

    intr = np.asarray(DEFAULT_CALIB_A6['intrinsic'], np.float64)
    ext = np.asarray(DEFAULT_CALIB_A6['extrinsic'], np.float64)
    # extrinsic = [tx, ty, tz, rx, ry, rz] world -> camera
    world2cam = np.eye(4)
    world2cam[:3, :3] = euler_to_mat(ext[3], ext[4], ext[5])
    world2cam[:3, 3] = ext[:3]

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
        world = (DEFAULT_LIDAR_TO_WORLD[:3, :3] @ pts.T
                 + DEFAULT_LIDAR_TO_WORLD[:3, 3:4]).T
        cam = (world2cam[:3, :3] @ world.T + world2cam[:3, 3:4]).T
        u, v, z, valid = vadas_project(cam, intr, W, H)
        u, v, z = u[valid], v[valid], z[valid]
        z = np.clip(z, 0, args.max_depth)
        depth = np.zeros((H, W), np.float32)
        order = np.argsort(-z)  # near points overwrite far
        depth[v[order], u[order]] = z[order]
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
