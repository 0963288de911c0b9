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


@pytest.mark.quick
def test_streaming_projection_matches_dense():
    """The online-softmax streaming path is numerically the same program as
    the dense [B,HW,K,3] path — values AND gradients (it exists purely to
    remove the patch materialization that pins the reference to half-res)."""
    rng = np.random.RandomState(1)
    rays = pinhole_ray_surface(make_K(), H, W)
    rays = rays + jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)) * 0.02
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    depth = jnp.asarray((rng.rand(B, H, W, 1) * 4 + 1).astype(np.float32))
    cam = GenericCamera.create(rays, patch_side=3)
    pts = cam.reconstruct(depth, frame='c')

    # NOTE on tolerances: the annealed temperature is ~1e-4, so the softmax
    # is near-argmax and logit rounding (fp32 ulp) is amplified ~1/T in the
    # weights; ~1e-4 coordinate noise (=0.003 px) between formulations is
    # inherent, not a bug.
    for downsample in (False, True):
        dense = cam.project(pts, progress=0.3, downsample=downsample,
                            backend='dense')
        stream = cam.project(pts, progress=0.3, downsample=downsample,
                             backend='streaming')
        np.testing.assert_allclose(np.asarray(stream), np.asarray(dense),
                                   rtol=1e-3, atol=2e-4)

    def loss(r, mode):
        c = GenericCamera.create(r, patch_side=3)
        return jnp.sum(c.project(pts, progress=0.3, downsample=False,
                                 backend=mode) ** 2)

    g_dense = np.asarray(jax.grad(lambda r: loss(r, 'dense'))(rays))
    g_stream = np.asarray(jax.grad(lambda r: loss(r, 'streaming'))(rays))
    np.testing.assert_allclose(g_stream, g_dense, rtol=5e-3,
                               atol=2e-3 * np.abs(g_dense).max())


@pytest.mark.quick
def test_pallas_projection_matches_dense():
    """Pallas kernel (interpret mode off-TPU) == dense softmax: values and
    gradients (bwd is the analytic Pallas adjoint kernel)."""
    rng = np.random.RandomState(2)
    rays = pinhole_ray_surface(make_K(), H, W)
    rays = rays + jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)) * 0.02
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    depth = jnp.asarray((rng.rand(B, H, W, 1) * 4 + 1).astype(np.float32))
    cam = GenericCamera.create(rays, patch_side=3)
    pts = cam.reconstruct(depth, frame='c')

    # tolerance note: see test_streaming_projection_matches_dense
    dense = cam.project(pts, progress=0.3, downsample=False, backend='dense')
    pall = cam.project(pts, progress=0.3, downsample=False, backend='pallas')
    np.testing.assert_allclose(np.asarray(pall), np.asarray(dense),
                               rtol=1e-3, atol=2e-4)

    def loss(r, mode):
        c = GenericCamera.create(r, patch_side=3)
        return jnp.sum(c.project(pts, progress=0.3, downsample=False,
                                 backend=mode) ** 2)

    g_dense = np.asarray(jax.grad(lambda r: loss(r, 'dense'))(rays))
    g_pall = np.asarray(jax.grad(lambda r: loss(r, 'pallas'))(rays))
    np.testing.assert_allclose(g_pall, g_dense, rtol=5e-3,
                               atol=2e-3 * np.abs(g_dense).max())


@pytest.mark.quick
@pytest.mark.parametrize('shape', [(1, 10, 16, 4),   # border-dominated
                                   (2, 9, 11, 4),    # k1 == H (full-height window)
                                   (1, 21, 48, 2)])  # odd row tile (TH=7)
def test_pallas_projection_analytic_adjoint(shape):
    """The analytic Pallas backward kernel (softmax-expectation gradient +
    inverse-roll scatter, ops/pallas/generic_projection.py _proj_bwd_kernel)
    equals autodiff through the XLA streaming oracle, including the shifted
    border windows and row tiles that alias ray rows."""
    from packnet_sfm_tpu.ops.pallas.generic_projection import (
        expected_patch_coords, _expected_xla)
    b, h, w, p = shape
    rng = np.random.RandomState(3)
    ray = jnp.asarray(rng.randn(b, 3, h, w), jnp.float32)
    d = jnp.asarray(rng.randn(b, 3, h, w), jnp.float32)
    gy = jnp.asarray(rng.randn(b, h, w), jnp.float32)
    gx = jnp.asarray(rng.randn(b, h, w), jnp.float32)

    def lp(r, dd):
        rows, cols = expected_patch_coords(r, dd, p, True)
        return jnp.sum(rows * gy) + jnp.sum(cols * gx)

    def lx(r, dd):
        rows, cols = _expected_xla(r, dd, p)
        return jnp.sum(rows * gy) + jnp.sum(cols * gx)

    g_pall = jax.grad(lp, argnums=(0, 1))(ray, d)
    g_xla = jax.grad(lx, argnums=(0, 1))(ray, d)
    for a, b_ in zip(g_pall, g_xla):
        a, b_ = np.asarray(a), np.asarray(b_)
        np.testing.assert_allclose(a, b_, atol=5e-5 * np.abs(b_).max())


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


def test_generic_selfsup_full_res_projection():
    """TPU-native full-res projection config (loss.generic_full_res):
    factory wiring + a full train-style fwd/bwd at full resolution."""
    cfg = get_cfg_defaults()
    cfg.model.name = 'GenericSelfSupModel'
    cfg.model.depth_net.name = 'RaySurfaceResNet'
    cfg.model.depth_net.version = '18pt'
    cfg.model.pose_net.name = 'PoseNet'
    cfg.model.loss.generic_full_res = True
    import dataclasses
    model = setup_model(cfg)
    assert model.generic_photometric_loss.full_res_projection
    small_loss = dataclasses.replace(model.generic_photometric_loss,
                                     patch_side=3)
    model = model.clone(generic_photometric_loss=small_loss)
    rng = np.random.RandomState(1)
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
