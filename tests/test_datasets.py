"""Dataset reader tests over synthetic on-disk fixture trees."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from packnet_sfm_tpu.datasets.kitti import KITTIDataset
from packnet_sfm_tpu.datasets.ncdb import NcdbDataset
from packnet_sfm_tpu.datasets.transforms import (
    get_transforms, parse_crop_borders, resize_depth_preserve)
from packnet_sfm_tpu.datasets.loader import DataLoader, default_collate
from packnet_sfm_tpu.datasets.synthetic import SyntheticDataset

pytestmark = pytest.mark.quick


H, W = 32, 48


def write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def make_kitti_tree(root):
    drive = os.path.join(root, '2011_09_26', '2011_09_26_drive_0001_sync')
    date_dir = os.path.join(root, '2011_09_26')
    rng = np.random.RandomState(0)
    names = []
    for i in range(4):
        name = '{:010d}.png'.format(i)
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        write_png(os.path.join(drive, 'image_02', 'data', name), img)
        depth = (rng.rand(H, W) * 20 * 256).astype(np.uint16)
        write_png(os.path.join(drive, 'proj_depth', 'groundtruth',
                               'image_02', name), depth)
        np.savez(_mk(os.path.join(drive, 'proj_depth', 'velodyne', 'image_02'),
                     name.replace('.png', '.npz')),
                 velodyne_depth=(rng.rand(H, W) * 20).astype(np.float32))
        # oxts: lat lon alt roll pitch yaw (+ padding)
        oxts_dir = os.path.join(drive, 'oxts', 'data')
        os.makedirs(oxts_dir, exist_ok=True)
        vals = [49.0 + i * 1e-6, 8.43 + i * 1e-6, 112.0, 0.01, 0.02,
                0.5 + 0.001 * i] + [0.0] * 24
        np.savetxt(os.path.join(oxts_dir, name.replace('.png', '.txt')),
                   np.asarray(vals)[None], delimiter=' ')
        names.append(name)
    # calib files
    P = np.array([W, 0, W / 2, 0, 0, W, H / 2, 0, 0, 0, 1, 0], float)
    with open(os.path.join(date_dir, 'calib_cam_to_cam.txt'), 'w') as f:
        f.write('P_rect_02: ' + ' '.join(map(str, P)) + '\n')
        f.write('R_rect_00: ' + ' '.join(map(str, np.eye(3).ravel())) + '\n')
    for fn, (Rv, tv) in [('calib_velo_to_cam.txt', (np.eye(3), np.zeros(3))),
                         ('calib_imu_to_velo.txt', (np.eye(3), np.zeros(3)))]:
        with open(os.path.join(date_dir, fn), 'w') as f:
            f.write('R: ' + ' '.join(map(str, Rv.ravel())) + '\n')
            f.write('T: ' + ' '.join(map(str, tv.ravel())) + '\n')
    rel = ['2011_09_26/2011_09_26_drive_0001_sync/image_02/data/' + n
           for n in names]
    with open(os.path.join(root, 'split.txt'), 'w') as f:
        f.write('\n'.join(rel))
    return root


def _mk(d, name):
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


@pytest.fixture
def kitti_root(tmp_path):
    return make_kitti_tree(str(tmp_path))


def test_kitti_reader_basic(kitti_root):
    ds = KITTIDataset(path=kitti_root, split='split.txt',
                      depth_type='groundtruth', back_context=1,
                      forward_context=1, with_pose=True)
    assert len(ds) == 2  # frames 1..2 have full context
    s = ds[0]
    assert s['rgb'].shape == (H, W, 3)
    assert s['depth'].shape == (H, W, 1)
    assert len(s['rgb_context']) == 2
    assert s['intrinsics'].shape == (3, 3)
    assert s['pose'].shape == (4, 4)
    assert len(s['pose_context']) == 2
    # relative context poses should be near identity (tiny motion)
    np.testing.assert_allclose(s['pose_context'][0], np.eye(4), atol=0.5)


def test_kitti_velodyne_npz(kitti_root):
    ds = KITTIDataset(path=kitti_root, split='split.txt',
                      depth_type='velodyne')
    s = ds[0]
    assert s['depth'].shape == (H, W, 1)


def test_kitti_with_transform(kitti_root):
    tf = get_transforms('train', image_shape=(16, 24),
                        jittering=(0.2, 0.2, 0.2, 0.05))
    ds = KITTIDataset(path=kitti_root, split='split.txt',
                      depth_type='groundtruth', back_context=1,
                      forward_context=1, transform=tf)
    s = ds[0]
    assert s['rgb'].shape == (16, 24, 3)
    assert s['rgb_original'].shape == (16, 24, 3)
    assert s['depth'].shape == (16, 24, 1)
    # intrinsics rescaled
    assert abs(s['intrinsics'][0, 0] - W * (24 / W)) < 1e-4


def make_ncdb_tree(root):
    rng = np.random.RandomState(1)
    sd = os.path.join(root, 'synced_data')
    entries = []
    for i in range(3):
        stem = 'frame_{:04d}'.format(i)
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        write_png(os.path.join(sd, 'image_a6', stem + '.png'), img)
        depth = (rng.rand(H, W) * 12 * 256).astype(np.uint16)
        write_png(os.path.join(sd, 'newest_original_depth_maps',
                               stem + '.png'), depth)
        entries.append({'dataset_root': 'synced_data', 'new_filename': stem})
    with open(os.path.join(root, 'split.json'), 'w') as f:
        json.dump(entries, f)
    return root


@pytest.fixture
def ncdb_root(tmp_path):
    return make_ncdb_tree(str(tmp_path))


def test_ncdb_reader(ncdb_root):
    ds = NcdbDataset(path=ncdb_root, split='split.json',
                     depth_type='depth_original', min_depth=0.5,
                     max_depth=15.0)
    assert len(ds) == 3
    s = ds[0]
    assert s['rgb'].shape == (H, W, 3)
    assert s['depth'].shape == (H, W, 1)
    d = s['depth']
    valid = d[d > 0]
    assert valid.size == 0 or (valid >= 0.5).all() and (valid <= 15.0).all()
    assert s['distortion_coeffs']['k'].shape == (7,)
    assert float(s['distortion_coeffs']['ux']) == pytest.approx(44.9516)


def test_ncdb_image_path_split(ncdb_root):
    entries = [{'image_path': os.path.join(
        ncdb_root, 'synced_data', 'image_a6', 'frame_0001.png')}]
    p = os.path.join(ncdb_root, 'split2.json')
    with open(p, 'w') as f:
        json.dump(entries, f)
    ds = NcdbDataset(path=ncdb_root, split='split2.json')
    assert len(ds) == 1
    assert ds[0]['filename'] == 'frame_0001'


@pytest.mark.parametrize('borders,shape,want', [
    # golden values generated from the reference utils/misc.py:77-146
    ((), (375, 1242), (0, 0, 1242, 375)),
    ((-352, 0, 0.5, 1216), (375, 1242), (13, 23, 1229, 375)),
    ((10, 20, 30, 40), (100, 200), (30, 10, 70, 30)),      # end = length
    ((10, -20, 30, -40), (100, 200), (30, 10, 160, 80)),   # end <= 0 = from far border
    ((-50, 0, -60, 0), (100, 200), (140, 50, 200, 100)),   # negative start
    ((0.5, 80, 0.5, 100), (100, 200), (50, 10, 150, 90)),  # centered floats
    ((0.25, 40, 30, -40), (100, 200), (30, 5, 160, 45)),   # mixed axes
    ((10, 20), (100, 200), (20, 10, 200, 100)),            # 2-value margins
    ((-10, -20), (100, 200), (0, 0, 180, 90)),
    ((80, 0.5), (100, 200), (60, 10, 140, 90)),            # 2-value centered
])
def test_parse_crop_borders_reference_golden(borders, shape, want):
    assert tuple(parse_crop_borders(borders, shape)) == want


def test_parse_crop_borders_kitti_san():
    """The KITTI-SAN config's (-352, 0, 0.5, 1216) -> bottom 352 rows,
    centered 1216 px (SURVEY.md §2.11)."""
    borders = parse_crop_borders((-352, 0, 0.5, 1216), (375, 1242))
    left, top, right, bottom = borders
    assert (bottom - top) == 352 and (right - left) == 1216
    assert top == 375 - 352


def test_resize_depth_preserve_keeps_values():
    d = np.zeros((20, 20), np.float32)
    d[5, 5] = 7.0
    d[15, 10] = 3.0
    out = resize_depth_preserve(d, (10, 10))
    assert out.shape == (10, 10, 1)
    vals = sorted(out[out > 0].tolist())
    assert vals == [3.0, 7.0]


def test_loader_sharding():
    ds = SyntheticDataset(num_samples=16, height=8, width=8)
    l0 = DataLoader(ds, batch_size=2, shard_index=0, num_shards=2,
                    num_workers=1)
    l1 = DataLoader(ds, batch_size=2, shard_index=1, num_shards=2,
                    num_workers=1)
    idx0 = [b['idx'].tolist() for b in l0]
    idx1 = [b['idx'].tolist() for b in l1]
    flat0 = sum(idx0, [])
    flat1 = sum(idx1, [])
    assert set(flat0).isdisjoint(flat1)
    assert len(flat0) == len(flat1) == 8


def make_dgp_tree(root):
    """Minimal DGP-layout scene fixture."""
    import json as _json
    rng = np.random.RandomState(5)
    scene_dir = os.path.join(root, 'scene_000')
    cams = ['CAMERA_01', 'CAMERA_05']
    samples = []
    for i in range(3):
        datums = []
        for cam in cams:
            fn = 'rgb/{}/{:06d}.png'.format(cam, i)
            write_png(os.path.join(scene_dir, fn),
                      (rng.rand(H, W, 3) * 255).astype(np.uint8))
            datums.append({'sensor': cam, 'filename': fn,
                           'pose': {'translation': {'x': 0.1 * i, 'y': 0,
                                                    'z': 0},
                                    'rotation': {'qw': 1, 'qx': 0, 'qy': 0,
                                                 'qz': 0}}})
        pc_fn = 'point_cloud/LIDAR/{:06d}.npz'.format(i)
        os.makedirs(os.path.join(scene_dir, 'point_cloud', 'LIDAR'),
                    exist_ok=True)
        pts = rng.rand(200, 3).astype(np.float32) * [4, 3, 10] - [2, 1.5, 0]
        pts[:, 2] += 2.0
        np.savez(os.path.join(scene_dir, pc_fn), data=pts)
        datums.append({'sensor': 'LIDAR', 'filename': pc_fn,
                       'pose': {'translation': {'x': 0, 'y': 0, 'z': 0},
                                'rotation': {'qw': 1, 'qx': 0, 'qy': 0,
                                             'qz': 0}}})
        samples.append({'datums': datums})
    with open(os.path.join(scene_dir, 'scene_abc.json'), 'w') as f:
        _json.dump({'samples': samples}, f)
    os.makedirs(os.path.join(scene_dir, 'calibration'), exist_ok=True)
    with open(os.path.join(scene_dir, 'calibration', 'cal.json'), 'w') as f:
        _json.dump({'names': cams,
                    'intrinsics': [{'fx': W, 'fy': W, 'cx': W / 2,
                                    'cy': H / 2}] * 2,
                    'extrinsics': [{'translation': {'x': 0, 'y': 0, 'z': 0},
                                    'rotation': {'qw': 1, 'qx': 0, 'qy': 0,
                                                 'qz': 0}}] * 2}, f)
    return root


def test_dgp_reader(tmp_path):
    from packnet_sfm_tpu.datasets.dgp import DGPDataset
    root = make_dgp_tree(str(tmp_path))
    ds = DGPDataset(path=root, cameras=['CAMERA_01'],
                    depth_type='lidar', back_context=1, forward_context=1)
    assert len(ds) == 1
    s = ds[0]
    assert s['rgb'].shape == (H, W, 3)
    assert s['depth'].shape == (H, W, 1)
    assert (s['depth'] > 0).sum() > 10  # lidar projected into frame
    assert len(s['rgb_context']) == 2


def test_dgp_multicam_stack(tmp_path):
    from packnet_sfm_tpu.datasets.dgp import DGPDataset
    root = make_dgp_tree(str(tmp_path))
    ds = DGPDataset(path=root, cameras=['CAMERA_01', 'CAMERA_05'],
                    depth_type='', back_context=0, forward_context=0)
    s = ds[0]
    assert s['rgb'].shape == (2, H, W, 3)  # sensor axis stacked


def test_multicam_fold_in_trainer_batch(tmp_path):
    """DGP multi-cam batches fold (B,N) into the batch axis on device."""
    import jax
    from packnet_sfm_tpu.datasets.dgp import DGPDataset
    from packnet_sfm_tpu.datasets.loader import DataLoader
    from packnet_sfm_tpu.parallel.mesh import make_mesh
    from packnet_sfm_tpu.trainers.trainer import _to_device_batch
    root = make_dgp_tree(str(tmp_path))
    ds = DGPDataset(path=root, cameras=['CAMERA_01', 'CAMERA_05'],
                    depth_type='lidar')
    loader = DataLoader(ds, batch_size=2, num_workers=1, drop_last=False)
    batch = next(iter(loader))
    assert batch['rgb'].shape[:2] == (2, 2)
    mesh = make_mesh((1,), ('data',), devices=jax.devices()[:1])
    dev = _to_device_batch(batch, mesh)
    assert dev['rgb'].shape == (4, H, W, 3)
    assert dev['depth'].shape == (4, H, W, 1)
    assert dev['intrinsics'].shape == (4, 3, 3)


def test_loader_mid_epoch_resume():
    """state_dict/load_state_dict replays the exact remaining batches."""
    ds = SyntheticDataset(num_samples=12, height=8, width=8)
    l1 = DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=1)
    l1.set_epoch(3)
    it = iter(l1)
    seen = [next(it)['idx'].tolist() for _ in range(2)]
    state = l1.state_dict()
    rest_ref = [b['idx'].tolist() for b in it]

    l2 = DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=1)
    l2.load_state_dict(state)
    rest = [b['idx'].tolist() for b in l2]
    assert rest == rest_ref
    assert state['batches_consumed'] == 2


def test_loader_drop_last_false_sees_all():
    ds = SyntheticDataset(num_samples=7, height=8, width=8)
    loader = DataLoader(ds, batch_size=2, num_workers=1, drop_last=False)
    seen = sum(len(b['idx']) for b in loader)
    assert seen == 7
    loader2 = DataLoader(ds, batch_size=2, num_workers=1, drop_last=True)
    assert sum(len(b['idx']) for b in loader2) == 6
