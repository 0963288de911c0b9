"""
DGP/DDAD dataset reader (TRI Dataset Governance Policy on-disk format).

The reference wraps TRI's `dgp` library (reference: datasets/dgp_dataset.py:58-284
SynchronizedSceneDataset with multi-camera rigs, lidar-projected depth and
pose). That library isn't a dependency here; this is a self-contained reader
for the DGP scene layout:

    <root>/<scene_dir>/scene*.json          protobuf-JSON scene description
    <root>/<scene_dir>/rgb/<CAMERA>/<ts>.png|jpg
    <root>/<scene_dir>/point_cloud/<LIDAR>/<ts>.npz   (structured 'data' array)
    <root>/<scene_dir>/calibration/<hash>.json        per-sensor K + extrinsics

Supported subset (documented; the full DGP schema is much larger):
- synchronized samples across the requested `cameras` list
- pinhole intrinsics [fx, fy, cx, cy] from the calibration file
- depth maps rendered by projecting the lidar datum into each camera
- per-datum pose (world <- sensor) as quaternion + translation
- temporal contexts by sample index

Split files: 'train'/'val' scene-list JSON ({"scenes": [dirs]}) or a plain
directory scan.
"""

import json
import os
import glob

import numpy as np

from packnet_sfm_tpu.datasets.io import load_image


def quat_to_rot(q):
    """[qw,qx,qy,qz] -> [3,3] rotation."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float64)


def pose_from_dict(d):
    """DGP pose dict {translation:{x,y,z}, rotation:{qw,qx,qy,qz}} -> [4,4]."""
    t = d.get('translation', {})
    r = d.get('rotation', {})
    T = np.eye(4)
    T[:3, :3] = quat_to_rot([r.get('qw', 1.0), r.get('qx', 0.0),
                             r.get('qy', 0.0), r.get('qz', 0.0)])
    T[:3, 3] = [t.get('x', 0.0), t.get('y', 0.0), t.get('z', 0.0)]
    return T.astype(np.float32)


def project_lidar_to_depth(points_world, cam_pose, K, H, W):
    """Render a sparse depth map from world-frame lidar points."""
    Tcw = np.linalg.inv(cam_pose)  # world -> camera
    pts = (Tcw[:3, :3] @ points_world.T + Tcw[:3, 3:4]).T
    z = pts[:, 2]
    valid = z > 0.1
    pts = pts[valid]
    z = z[valid]
    u = (K[0, 0] * pts[:, 0] / z + K[0, 2]).astype(int)
    v = (K[1, 1] * pts[:, 1] / z + K[1, 2]).astype(int)
    inside = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    depth = np.zeros((H, W), np.float32)
    # nearest point wins (sort far -> near so near overwrites)
    order = np.argsort(-z[inside])
    uu, vv, zz = u[inside][order], v[inside][order], z[inside][order]
    depth[vv, uu] = zz
    return depth[..., None]


class DGPDataset:
    def __init__(self, path, split='', cameras=('CAMERA_01',),
                 depth_type='', input_depth_type='', back_context=0,
                 forward_context=0, with_pose=True, transform=None,
                 cache_depth_maps=True, **kwargs):
        self.root = path
        self.cameras = list(cameras) if cameras else ['CAMERA_01']
        self.depth_type = depth_type
        self.with_depth = bool(depth_type)
        self.input_depth_type = input_depth_type
        self.with_input_depth = bool(input_depth_type)
        self.back_context = back_context
        self.forward_context = forward_context
        self.with_pose = with_pose
        self.transform = transform
        # rendered lidar depth maps are cached as npz next to the scene
        # (reference: dgp_dataset.py:121-166 generate_depth_map cache)
        self.cache_depth_maps = cache_depth_maps

        if split and os.path.isfile(os.path.join(path, split)):
            with open(os.path.join(path, split)) as f:
                scene_dirs = json.load(f).get('scenes', [])
        else:
            scene_dirs = sorted(
                d for d in os.listdir(path)
                if os.path.isdir(os.path.join(path, d)) and
                glob.glob(os.path.join(path, d, 'scene*.json')))
        self.samples = []   # (scene_dir, sample_idx)
        self.scenes = {}
        for sd in scene_dirs:
            scene = self._load_scene(os.path.join(path, sd))
            if scene is None:
                continue
            self.scenes[sd] = scene
            n = len(scene['samples'])
            lo, hi = self.back_context, n - self.forward_context
            for i in range(lo, hi):
                self.samples.append((sd, i))

    def _load_scene(self, scene_dir):
        files = sorted(glob.glob(os.path.join(scene_dir, 'scene*.json')))
        if not files:
            return None
        with open(files[0]) as f:
            scene = json.load(f)
        calib = {}
        cal_files = glob.glob(os.path.join(scene_dir, 'calibration', '*.json'))
        if cal_files:
            with open(cal_files[0]) as f:
                cal = json.load(f)
            for name, K_entry, ext in zip(cal.get('names', []),
                                          cal.get('intrinsics', []),
                                          cal.get('extrinsics', [])):
                K = np.array([[K_entry['fx'], 0, K_entry['cx']],
                              [0, K_entry['fy'], K_entry['cy']],
                              [0, 0, 1]], np.float32)
                calib[name] = {'K': K, 'extrinsics': pose_from_dict(ext)}
        samples = []
        for s in scene.get('samples', scene.get('data', [])):
            datums = s.get('datums', s)
            samples.append(datums)
        return {'dir': scene_dir, 'samples': samples, 'calibration': calib}

    def __len__(self):
        return len(self.samples)

    def _camera_datum(self, scene, sample, cam):
        for d in sample:
            if d.get('sensor') == cam or d.get('id', {}).get('name') == cam:
                return d
        return None

    def _load_cam_sample(self, scene, sample, cam):
        datum = self._camera_datum(scene, sample, cam)
        assert datum is not None, 'camera {} missing in sample'.format(cam)
        rgb = load_image(os.path.join(scene['dir'], datum['filename']))
        K = scene['calibration'][cam]['K']
        pose = pose_from_dict(datum.get('pose', {}))
        return rgb, K, pose, datum

    def _lidar_depth(self, scene, sample, cam_pose, K, H, W, sd, si, cam,
                     kind):
        """Render (and cache) the lidar-projected depth map for one camera
        datum (reference: dgp_dataset.py:121-166)."""
        cache = os.path.join(scene['dir'], 'depth', kind or 'lidar', cam,
                             '{:06d}.npz'.format(si))
        if self.cache_depth_maps and os.path.exists(cache):
            return np.load(cache)['depth'].astype(np.float32)[..., None]
        lidar = next((d for d in sample
                      if 'point_cloud' in d.get('filename', '')), None)
        if lidar is None:
            return None
        pc = np.load(os.path.join(scene['dir'], lidar['filename']))['data']
        pts = np.stack([pc['X'], pc['Y'], pc['Z']], 1) \
            if pc.dtype.names else pc[:, :3]
        lidar_pose = pose_from_dict(lidar.get('pose', {}))
        world = (lidar_pose[:3, :3] @ pts.T + lidar_pose[:3, 3:4]).T
        depth = project_lidar_to_depth(world, cam_pose, K, H, W)
        if self.cache_depth_maps:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            tmp = '{}.tmp{}.npz'.format(cache[:-4], os.getpid())
            with open(tmp, 'wb') as f:
                np.savez_compressed(f, depth=depth[..., 0])
            os.replace(tmp, cache)
        return depth

    def __getitem__(self, idx):
        sd, si = self.samples[idx]
        scene = self.scenes[sd]
        sample = scene['samples'][si]

        per_cam = []
        for cam in self.cameras:
            rgb, K, pose, datum = self._load_cam_sample(scene, sample, cam)
            H, W = rgb.shape[:2]
            out = {
                'idx': idx,
                'sensor_name': cam,
                'filename': '{}_{}_{}'.format(sd, si, cam),
                'rgb': rgb,
                'intrinsics': K,
            }
            if self.with_pose:
                out['pose'] = pose
                out['extrinsics'] = scene['calibration'].get(
                    cam, {}).get('extrinsics', np.eye(4, dtype=np.float32))
            if self.with_depth:
                depth = self._lidar_depth(scene, sample, pose, K, H, W,
                                          sd, si, cam, self.depth_type)
                if depth is not None:
                    out['depth'] = depth
            if self.with_input_depth:
                depth = self._lidar_depth(scene, sample, pose, K, H, W,
                                          sd, si, cam, self.input_depth_type)
                if depth is not None:
                    out['input_depth'] = depth
            ctx_rgb, ctx_pose = [], []
            for off in list(range(-self.back_context, 0)) + \
                    list(range(1, self.forward_context + 1)):
                c_sample = scene['samples'][si + off]
                c_rgb, _, c_pose, _ = self._load_cam_sample(scene, c_sample,
                                                            cam)
                ctx_rgb.append(c_rgb)
                ctx_pose.append(c_pose)
            if ctx_rgb:
                out['rgb_context'] = ctx_rgb
                if self.with_pose:
                    # relative target->context motion, per camera
                    # (reference: dgp_dataset.py:261-272)
                    inv_pose = np.linalg.inv(out['pose'])
                    out['pose_context'] = [
                        (inv_pose @ p).astype(np.float32) for p in ctx_pose]
            if self.transform:
                out = self.transform(out)
            per_cam.append(out)
        if len(per_cam) == 1:
            return per_cam[0]
        return stack_sample(per_cam)


def stack_sample(samples):
    """Stack per-camera samples along a leading sensor axis
    (reference: datasets/dgp_dataset.py stack_sample +
    models/model_utils.py:68-94 stack_batch)."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], list):
            out[key] = [np.stack([v[i] for v in vals])
                        for i in range(len(vals[0]))]
        else:
            out[key] = vals[0]
    return out


def fold_multicam_batch(batch):
    """(B,N,...) -> (B*N,...) for multi-camera rigs
    (reference: models/model_utils.py:68-94)."""
    def fold(x):
        if hasattr(x, 'ndim') and x.ndim >= 3:
            return x.reshape((-1,) + tuple(x.shape[2:]))
        return x
    import jax
    return jax.tree_util.tree_map(fold, batch)
