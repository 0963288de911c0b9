"""
KITTI_raw dataset reader (host-side numpy).

Layout + semantics matched to the reference reader
(reference: datasets/kitti_dataset_optimized.py:242-760 and
datasets/kitti_dataset_utils.py):
- split files list image paths relative to the root (first column used)
- intrinsics = P_rect_0X[:3,:3] from calib_cam_to_cam.txt       (:466-475)
- depth: 'groundtruth' -> proj_depth/groundtruth/image_0X png/256;
  other types -> proj_depth/<type>/image_0X .npz                (:491-500)
- temporal context by filename index +-stride                    (:502-588)
- pose from OXTS packets via Mercator projection, chained
  imu2cam @ origin^-1 @ pose @ imu2cam^-1                        (:590-654)

Context GT poses are returned as target->context relative transforms
(what VelocityLoss consumes).
"""

import os

import numpy as np

from packnet_sfm_tpu.datasets.io import load_image, load_depth

IMAGE_FOLDER = {'left': 'image_02', 'right': 'image_03'}
CALIB_FILE = {'cam2cam': 'calib_cam_to_cam.txt',
              'velo2cam': 'calib_velo_to_cam.txt',
              'imu2velo': 'calib_imu_to_velo.txt'}
PNG_DEPTH_DATASETS = ['groundtruth']
OXTS_POSE_DATA = 'oxts'

OXTS_FIELDS = ['lat', 'lon', 'alt', 'roll', 'pitch', 'yaw']


def read_calib_file(path):
    data = {}
    with open(path) as f:
        for line in f:
            if ':' not in line:
                continue
            key, value = line.split(':', 1)
            try:
                data[key] = np.array([float(x) for x in value.split()])
            except ValueError:
                pass
    return data


def transform_from_rot_trans(R, t):
    return np.vstack((np.hstack([R.reshape(3, 3), t.reshape(3, 1)]),
                      [0, 0, 0, 1]))


def rotx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def roty(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def pose_from_oxts_packet(raw, scale):
    """Mercator-projected SE(3) from an OXTS packet (kitti_dataset_utils.py:138-176)."""
    lat, lon, alt, roll, pitch, yaw = raw[:6]
    er = 6378137.0
    tx = scale * lon * np.pi * er / 180.0
    ty = scale * er * np.log(np.tan((90.0 + lat) * np.pi / 360.0))
    t = np.array([tx, ty, alt])
    R = rotz(yaw) @ roty(pitch) @ rotx(roll)
    return R, t


class KITTIDataset:
    def __init__(self, path, split, depth_type='', input_depth_type='',
                 back_context=0, forward_context=0, strides=(1,),
                 with_pose=False, transform=None, **kwargs):
        self.root = path
        self.split = split
        self.depth_type = depth_type
        self.input_depth_type = input_depth_type
        self.back_context = back_context
        self.forward_context = forward_context
        self.stride = strides[0] if strides else 1
        self.with_pose = with_pose
        self.transform = transform
        self._calib_cache = {}
        self._oxts_cache = {}

        split_file = os.path.join(path, split) if split else None
        assert split_file and os.path.isfile(split_file), \
            'KITTI split file not found: {}'.format(split_file)
        self.paths = self._load_paths_cached(split_file)

    def _load_paths_cached(self, split_file):
        """Validated path list with an on-disk cache keyed by the split file
        and options (reference: kitti_dataset_optimized.py:59-113 FileCache —
        the eigen splits cost ~200k stat() calls without it). Disable with
        KITTI_CACHE_DIR=''. """
        import hashlib
        import pickle
        cache_dir = os.environ.get('KITTI_CACHE_DIR',
                                   '/tmp/packnet_sfm_tpu_kitti_cache')
        key = None
        if cache_dir:
            sig = '{}:{}:{}:{}:{}:{}'.format(
                split_file, os.path.getmtime(split_file), self.depth_type,
                self.input_depth_type, self.back_context,
                self.forward_context)
            key = os.path.join(cache_dir, hashlib.sha1(
                sig.encode()).hexdigest() + '.pkl')
            if os.path.isfile(key):
                try:
                    with open(key, 'rb') as f:
                        return pickle.load(f)
                except Exception:
                    pass
        with open(split_file) as f:
            lines = [l.strip().split()[0] for l in f if l.strip()]
        paths = [os.path.join(self.root, l) for l in lines]
        # validate in parallel (stat-bound; threads release the GIL)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(16) as pool:
            ok = list(pool.map(
                lambda p: os.path.isfile(p) and self._valid(p), paths))
        paths = [p for p, o in zip(paths, ok) if o]
        if key:
            try:
                os.makedirs(cache_dir, exist_ok=True)
                with open(key, 'wb') as f:
                    pickle.dump(paths, f)
            except OSError:
                pass
        return paths

    # ------------------------------------------------------------- file maps
    @staticmethod
    def _get_depth_file(image_file, depth_type):
        for cam in ('left', 'right'):
            folder = IMAGE_FOLDER[cam]
            if folder in image_file:
                if depth_type in PNG_DEPTH_DATASETS:
                    return image_file.replace(
                        '{}/data'.format(folder),
                        'proj_depth/groundtruth/{}'.format(folder))
                return image_file.replace(
                    '{}/data'.format(folder),
                    'proj_depth/{}/{}'.format(depth_type, folder)
                ).replace('.png', '.npz')
        raise ValueError('Invalid KITTI path: ' + image_file)

    @staticmethod
    def _neighbor_file(image_file, offset):
        base, ext = os.path.splitext(os.path.basename(image_file))
        return os.path.join(os.path.dirname(image_file),
                            str(int(base) + offset).zfill(len(base)) + ext)

    def _context_files(self, image_file):
        offs = [-(i + 1) * self.stride for i in range(self.back_context)][::-1] \
            + [(i + 1) * self.stride for i in range(self.forward_context)]
        return [self._neighbor_file(image_file, o) for o in offs]

    def _valid(self, image_file):
        for f in self._context_files(image_file):
            if not os.path.isfile(f):
                return False
        for dt in (self.depth_type, self.input_depth_type):
            if dt and not os.path.isfile(self._get_depth_file(image_file, dt)):
                return False
        return True

    # ------------------------------------------------------------ intrinsics
    @staticmethod
    def _parent_folder(image_file):
        """Drive date folder containing the calib txts."""
        return os.path.abspath(os.path.join(os.path.dirname(image_file),
                                            '..', '..', '..'))

    def _calib(self, image_file):
        folder = self._parent_folder(image_file)
        if folder not in self._calib_cache:
            self._calib_cache[folder] = read_calib_file(
                os.path.join(folder, CALIB_FILE['cam2cam']))
        return self._calib_cache[folder]

    def _intrinsics(self, image_file):
        calib = self._calib(image_file)
        for cam in ('left', 'right'):
            folder = IMAGE_FOLDER[cam]
            if folder in image_file:
                key = 'P_rect_{}'.format(folder[-2:])
                return calib[key].reshape(3, 4)[:3, :3].astype(np.float32)
        raise ValueError('Invalid KITTI path: ' + image_file)

    # ------------------------------------------------------------------ pose
    def _oxts(self, image_file):
        for cam in ('left', 'right'):
            folder = IMAGE_FOLDER[cam]
            if folder in image_file:
                f = image_file.replace('{}/data'.format(folder),
                                       OXTS_POSE_DATA + '/data'
                                       ).replace('.png', '.txt')
                if f not in self._oxts_cache:
                    self._oxts_cache[f] = np.loadtxt(f, delimiter=' ')
                return self._oxts_cache[f]
        raise ValueError('Invalid KITTI path for pose: ' + image_file)

    def _imu2cam(self, image_file):
        folder = self._parent_folder(image_file)
        cam2cam = read_calib_file(os.path.join(folder, CALIB_FILE['cam2cam']))
        imu2velo = read_calib_file(os.path.join(folder, CALIB_FILE['imu2velo']))
        velo2cam = read_calib_file(os.path.join(folder, CALIB_FILE['velo2cam']))
        velo2cam_mat = transform_from_rot_trans(velo2cam['R'], velo2cam['T'])
        imu2velo_mat = transform_from_rot_trans(imu2velo['R'], imu2velo['T'])
        cam_2rect = transform_from_rot_trans(cam2cam['R_rect_00'], np.zeros(3))
        return cam_2rect @ velo2cam_mat @ imu2velo_mat

    def _pose(self, image_file):
        base, ext = os.path.splitext(os.path.basename(image_file))
        origin_frame = os.path.join(os.path.dirname(image_file),
                                    '0'.zfill(len(base)) + ext)
        origin_oxts = self._oxts(origin_frame)
        scale = np.cos(origin_oxts[0] * np.pi / 180.0)
        oR, ot = pose_from_oxts_packet(origin_oxts, scale)
        origin_pose = transform_from_rot_trans(oR, ot)
        R, t = pose_from_oxts_packet(self._oxts(image_file), scale)
        pose = transform_from_rot_trans(R, t)
        imu2cam = self._imu2cam(image_file)
        return (imu2cam @ np.linalg.inv(origin_pose) @ pose @
                np.linalg.inv(imu2cam)).astype(np.float32)

    @staticmethod
    def _read_depth(path, depth_type):
        """png: /256; npz: key '{depth_type}_depth'
        (reference: kitti_dataset_optimized.py:42-53)."""
        if path.endswith('.npz'):
            return np.load(path)[depth_type + '_depth'].astype(
                np.float32)[..., None]
        return load_depth(path)[..., None]

    # --------------------------------------------------------------- getitem
    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        image_file = self.paths[idx]
        sample = {
            'idx': idx,
            'filename': '{}_{:010d}'.format(
                os.path.splitext(os.path.basename(self.split))[0], idx),
            'rgb': load_image(image_file),
            'intrinsics': self._intrinsics(image_file),
        }
        if self.depth_type:
            sample['depth'] = self._read_depth(
                self._get_depth_file(image_file, self.depth_type),
                self.depth_type)
        if self.input_depth_type:
            sample['input_depth'] = self._read_depth(
                self._get_depth_file(image_file, self.input_depth_type),
                self.input_depth_type)
        ctx_files = self._context_files(image_file)
        if ctx_files:
            sample['rgb_context'] = [load_image(f) for f in ctx_files]
            if self.with_pose:
                pose_t = self._pose(image_file)
                sample['pose_context'] = [
                    (np.linalg.inv(pose_t) @ self._pose(f)).astype(np.float32)
                    for f in ctx_files]
        if self.with_pose:
            sample['pose'] = self._pose(image_file)
        if self.transform:
            sample = self.transform(sample)
        return sample
