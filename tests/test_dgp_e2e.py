"""DDAD-layout (DGP scene-JSON) end-to-end: per-camera temporal contexts
with relative pose chains, input_depth rendering, depth-map caching, and a
full multi-camera train smoke through the Trainer (VERDICT round-1 item 8;
reference: datasets/dgp_dataset.py:58-284)."""

import json
import os

import numpy as np
import pytest

from PIL import Image

from packnet_sfm_tpu.datasets.dgp import DGPDataset

H, W = 32, 48
CAMS = ['CAMERA_01', 'CAMERA_05']


def make_ddad_tree(root, n_frames=6):
    rng = np.random.RandomState(7)
    scene_dir = os.path.join(root, 'scene_000')
    samples = []
    for i in range(n_frames):
        datums = []
        for ci, cam in enumerate(CAMS):
            fn = 'rgb/{}/{:06d}.png'.format(cam, i)
            os.makedirs(os.path.join(scene_dir, 'rgb', cam), exist_ok=True)
            Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)
                            ).save(os.path.join(scene_dir, fn))
            # each camera translates forward with a lateral offset per cam
            datums.append({
                'sensor': cam, 'filename': fn,
                'pose': {'translation': {'x': 0.5 * ci, 'y': 0.0,
                                         'z': 0.3 * i},
                         'rotation': {'qw': 1, 'qx': 0, 'qy': 0, 'qz': 0}}})
        pc_fn = 'point_cloud/LIDAR/{:06d}.npz'.format(i)
        os.makedirs(os.path.join(scene_dir, 'point_cloud', 'LIDAR'),
                    exist_ok=True)
        pts = rng.rand(400, 3).astype(np.float32) * [4, 3, 10] - [2, 1.5, 0]
        pts[:, 2] += 2.0 + 0.3 * i
        np.savez(os.path.join(scene_dir, pc_fn), data=pts)
        datums.append({'sensor': 'LIDAR', 'filename': pc_fn,
                       'pose': {'translation': {'x': 0, 'y': 0, 'z': 0},
                                'rotation': {'qw': 1, 'qx': 0, 'qy': 0,
                                             'qz': 0}}})
        samples.append({'datums': datums})
    with open(os.path.join(scene_dir, 'scene_abc.json'), 'w') as f:
        json.dump({'samples': samples}, f)
    os.makedirs(os.path.join(scene_dir, 'calibration'), exist_ok=True)
    with open(os.path.join(scene_dir, 'calibration', 'cal.json'), 'w') as f:
        json.dump({'names': CAMS,
                   'intrinsics': [{'fx': W, 'fy': W, 'cx': W / 2,
                                   'cy': H / 2}] * 2,
                   'extrinsics': [{'translation': {'x': 0.5 * ci, 'y': 0,
                                                   'z': 0},
                                   'rotation': {'qw': 1, 'qx': 0, 'qy': 0,
                                                'qz': 0}}
                                  for ci in range(2)]}, f)
    return root


def test_context_pose_chains(tmp_path):
    root = make_ddad_tree(str(tmp_path))
    ds = DGPDataset(path=root, cameras=['CAMERA_01'], depth_type='lidar',
                    input_depth_type='lidar', back_context=1,
                    forward_context=1, with_pose=True)
    s = ds[1]  # frame index 2 of 6
    assert len(s['rgb_context']) == 2
    assert len(s['pose_context']) == 2
    # frames move +0.3 z per step: relative context poses are -/+0.3
    np.testing.assert_allclose(s['pose_context'][0][:3, 3], [0, 0, -0.3],
                               atol=1e-5)
    np.testing.assert_allclose(s['pose_context'][1][:3, 3], [0, 0, 0.3],
                               atol=1e-5)
    np.testing.assert_allclose(s['pose_context'][0][:3, :3], np.eye(3),
                               atol=1e-6)
    assert s['depth'].shape == (H, W, 1)
    assert s['input_depth'].shape == (H, W, 1)
    assert (s['depth'] > 0).sum() > 10
    assert 'extrinsics' in s


def test_multicam_context_stack(tmp_path):
    root = make_ddad_tree(str(tmp_path))
    ds = DGPDataset(path=root, cameras=CAMS, depth_type='lidar',
                    back_context=1, forward_context=1, with_pose=True)
    s = ds[0]
    assert s['rgb'].shape == (2, H, W, 3)
    assert s['depth'].shape == (2, H, W, 1)
    assert s['pose'].shape == (2, 4, 4)
    assert len(s['rgb_context']) == 2
    assert s['rgb_context'][0].shape == (2, H, W, 3)
    assert len(s['pose_context']) == 2
    assert s['pose_context'][0].shape == (2, 4, 4)
    # global keys stay unstacked (reference stack_sample:28-29)
    assert isinstance(s['filename'], str)
    assert isinstance(s['sensor_name'], str)


def test_depth_map_cache(tmp_path):
    root = make_ddad_tree(str(tmp_path))
    ds = DGPDataset(path=root, cameras=['CAMERA_01'], depth_type='lidar')
    d1 = ds[0]['depth']
    cache = os.path.join(root, 'scene_000', 'depth', 'lidar', 'CAMERA_01',
                         '000000.npz')
    assert os.path.exists(cache)
    d2 = ds[0]['depth']  # served from cache
    np.testing.assert_allclose(d1, d2, atol=1e-6)


def test_ddad_train_smoke(tmp_path):
    """Multi-camera DDAD-layout training epoch through the Trainer
    (multicam fold + self-sup contexts)."""
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.trainers.trainer import Trainer

    root = make_ddad_tree(str(tmp_path))
    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupModel'
    cfg.model.loss.supervised_method = 'sparse-l1'
    cfg.model.loss.supervised_loss_weight = 0.9
    cfg.model.depth_net.name = 'DepthResNet'
    cfg.model.depth_net.version = '18A'
    cfg.model.pose_net.name = 'PoseNet'
    cfg.model.params.min_depth = 0.5
    cfg.model.params.max_depth = 15.0
    cfg.model.params.crop = ''
    cfg.arch.max_epochs = 1
    cfg.arch.eval_during_training = False
    cfg.datasets.augmentation.image_shape = (32, 64)  # /32-divisible dims
    for split in ('train', 'validation'):
        node = cfg.datasets[split]
        node.dataset = ['DGP']
        node.path = [root]
        node.split = ['']
        node.depth_type = ['lidar']
        node.cameras = [CAMS]
        node.batch_size = 2
        node.num_workers = 1
    cfg.datasets.train.back_context = 1
    cfg.datasets.train.forward_context = 1
    cfg.datasets.train.repeat = [1]
    cfg.datasets.test.dataset = []
    trainer = Trainer(cfg)
    trainer.fit()
    metrics = trainer.validate(trainer._make_loader('validation'))
    assert np.isfinite(metrics['depth-abs_rel'])
