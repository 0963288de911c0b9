"""Generic (ray-surface) camera family tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.geometry.camera_generic import (
    GenericCamera, pinhole_ray_surface, _patch_coords)
from packnet_sfm_tpu.config import get_cfg_defaults
from packnet_sfm_tpu.models import setup_model

B, H, W = 1, 16, 24


def make_K():
    K = np.array([[W, 0, W / 2 - 0.5], [0, W, H / 2 - 0.5], [0, 0, 1]],
                 np.float32)
    return jnp.asarray(np.tile(K[None], (B, 1, 1)))


def test_patch_coords_in_bounds():
    coords = _patch_coords(H, W, 3)
    assert coords.shape == (H * W, 49, 2)
    assert coords[..., 0].min() >= 0 and coords[..., 0].max() <= H - 1
    assert coords[..., 1].min() >= 0 and coords[..., 1].max() <= W - 1


def test_generic_projection_recovers_identity():
    """With a pinhole ray surface, projecting own reconstruction at low
    temperature recovers ~the identity grid."""
    rays = pinhole_ray_surface(make_K(), H, W)
    cam = GenericCamera.create(rays, patch_side=4)
    depth = jnp.ones((B, H, W, 1)) * 3.0
    pts = cam.reconstruct(depth, frame='c')
    coords = np.asarray(cam.project(pts, progress=1.0, downsample=False,
                                    frame='c'))
    xs = np.linspace(-1, 1, W, dtype=np.float32)
    ys = np.linspace(-1, 1, H, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    # interior only (patch shifting distorts borders)
    c = (slice(None), slice(4, H - 4), slice(4, W - 4))
    np.testing.assert_allclose(coords[..., 0][c], gx[None][c], atol=0.1)
    np.testing.assert_allclose(coords[..., 1][c], gy[None][c], atol=0.1)


def test_generic_selfsup_model_trains():
    cfg = get_cfg_defaults()
    cfg.model.name = 'GenericSelfSupModel'
    cfg.model.depth_net.name = 'RaySurfaceResNet'
    cfg.model.depth_net.version = '18pt'
    cfg.model.pose_net.name = 'PoseNet'
    import dataclasses
    model = setup_model(cfg)
    # patch-side 20 is too big for a tiny test image; rebuild with 3
    small_loss = dataclasses.replace(model.generic_photometric_loss,
                                     patch_side=3)
    model = model.clone(generic_photometric_loss=small_loss)
    rng = np.random.RandomState(0)
    h, w = 32, 64
    batch = {
        'rgb': jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32)),
        'rgb_context': [jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
                        for _ in range(2)],
        'intrinsics': jnp.asarray(np.tile(np.array(
            [[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]],
            np.float32)[None], (1, 1, 1))),
    }
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {'params': params,
             'batch_stats': variables.get('batch_stats', {})},
            batch, train=True, progress=0.5, mutable=['batch_stats'])
        return out['loss']

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
