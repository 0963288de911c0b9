"""YOLOv8SAN01 tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.networks.depth.yolov8_san import YOLOv8SAN01
from packnet_sfm_tpu.networks.layers.yolov8 import YOLOv8Backbone

B, H, W = 1, 64, 96


@pytest.fixture(scope='module')
def rgb():
    return jnp.asarray(np.random.RandomState(0).rand(B, H, W, 3), jnp.float32)


def test_backbone_pyramid(rgb):
    net = YOLOv8Backbone(variant='n')
    variables = net.init({'params': jax.random.PRNGKey(0)}, rgb, train=True)
    feats, _ = net.apply(variables, rgb, train=True, mutable=['batch_stats'])
    assert len(feats) == 5
    for i, f in enumerate(feats):
        assert f.shape[1] == H // 2 ** (i + 1)
        assert f.shape[2] == W // 2 ** (i + 1)


def test_yolov8_san_rgb(rgb):
    net = YOLOv8SAN01(variant='n')
    variables = net.init({'params': jax.random.PRNGKey(0)}, rgb, train=True)
    out, _ = net.apply(variables, rgb, train=True, mutable=['batch_stats'])
    assert len(out['inv_depths']) == 4
    assert out['inv_depths'][0].shape == (B, H, W, 1)


def test_yolov8_san_lidar_and_neck(rgb):
    rng = np.random.RandomState(1)
    d = jnp.asarray((rng.rand(B, H, W, 1) * 10 *
                     (rng.rand(B, H, W, 1) < 0.05)).astype(np.float32))
    net = YOLOv8SAN01(variant='n', use_film=True, use_depth_neck=True)
    variables = net.init({'params': jax.random.PRNGKey(0)}, rgb, d,
                         train=True)
    out, _ = net.apply(variables, rgb, d, train=True,
                       mutable=['batch_stats'])
    assert 'inv_depths_rgbd' in out and 'depth_loss' in out
    assert np.isfinite(float(out['depth_loss']))
