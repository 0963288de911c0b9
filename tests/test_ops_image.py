"""Golden-value tests for image ops against PyTorch (CPU) reference semantics."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from packnet_sfm_tpu.ops.image import (  # noqa: E402
    interpolate, grid_sample, gradient_x, gradient_y, flip_lr,
    upsample2x_nearest)
from packnet_sfm_tpu.ops.ssim import ssim  # noqa: E402

pytestmark = pytest.mark.quick



def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture
def rng():
    return np.random.RandomState(42)


@pytest.mark.parametrize('mode,align', [
    ('bilinear', True), ('bilinear', False), ('nearest', None)])
@pytest.mark.parametrize('shape', [
    (17, 31), (64, 96), (7, 5),
    # integer-ratio nearest fast paths (broadcast-repeat / strided-slice —
    # no gather): exact up, exact down, mixed (falls back to gather)
    (48, 80), (96, 160), (12, 20), (6, 10), (48, 31), (12, 160)])
def test_interpolate_matches_torch(rng, mode, align, shape):
    x = rng.randn(2, 24, 40, 3).astype(np.float32)
    kwargs = {} if mode == 'nearest' else {'align_corners': align}
    ref = F.interpolate(torch.from_numpy(to_nchw(x)), size=shape,
                        mode=mode, **kwargs).numpy()
    got = interpolate(jnp.asarray(x), shape, mode=mode,
                      align_corners=bool(align))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=5e-5)


def test_upsample2x_matches_torch(rng):
    x = rng.randn(2, 12, 20, 8).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(to_nchw(x)), scale_factor=2,
                        mode='nearest').numpy()
    got = upsample2x_nearest(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=0)


@pytest.mark.parametrize('padding', ['zeros', 'border'])
def test_grid_sample_matches_torch(rng, padding):
    x = rng.randn(2, 16, 24, 3).astype(np.float32)
    # Grid with in-bounds and far out-of-bounds samples
    grid = (rng.rand(2, 10, 14, 2).astype(np.float32) * 3.0 - 1.5)
    ref = F.grid_sample(torch.from_numpy(to_nchw(x)), torch.from_numpy(grid),
                        mode='bilinear', padding_mode=padding,
                        align_corners=True).numpy()
    got = grid_sample(jnp.asarray(x), jnp.asarray(grid), padding_mode=padding)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5)


def test_grid_sample_gradient_finite(rng):
    import jax
    x = jnp.asarray(rng.randn(1, 8, 8, 1).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32) * 2 - 1)

    def f(g):
        return grid_sample(x, g).sum()

    g = jax.grad(f)(grid)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.quick
@pytest.mark.parametrize('padding', ['zeros', 'border'])
def test_grid_sample_custom_vjp_matches_torch_grads(rng, padding):
    """The residual-based custom VJP (analytic coordinate gradient, zero
    gathers/scatters in bwd) must match torch.grid_sample autograd for BOTH
    cotangents, including out-of-bounds taps."""
    import jax
    x_np = rng.randn(2, 12, 18, 3).astype(np.float32)
    grid_np = (rng.rand(2, 9, 11, 2).astype(np.float32) * 2.6 - 1.3)
    cot_np = rng.randn(2, 9, 11, 3).astype(np.float32)

    xt = torch.from_numpy(to_nchw(x_np)).requires_grad_(True)
    gt = torch.from_numpy(grid_np).requires_grad_(True)
    out_t = F.grid_sample(xt, gt, mode='bilinear', padding_mode=padding,
                          align_corners=True)
    out_t.backward(torch.from_numpy(to_nchw(cot_np)))

    def f(im, gr):
        return jnp.sum(grid_sample(im, gr, padding_mode=padding)
                       * jnp.asarray(cot_np))

    dim, dgr = jax.grad(f, argnums=(0, 1))(jnp.asarray(x_np),
                                           jnp.asarray(grid_np))
    np.testing.assert_allclose(np.asarray(dgr), gt.grad.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dim), to_nhwc(xt.grad.numpy()),
                               rtol=1e-4, atol=2e-4)


def test_gradients_and_flip(rng):
    x = rng.randn(2, 8, 9, 3).astype(np.float32)
    t = torch.from_numpy(to_nchw(x))
    gx_ref = (t[:, :, :, :-1] - t[:, :, :, 1:]).numpy()
    gy_ref = (t[:, :, :-1, :] - t[:, :, 1:, :]).numpy()
    np.testing.assert_allclose(np.asarray(gradient_x(jnp.asarray(x))), to_nhwc(gx_ref))
    np.testing.assert_allclose(np.asarray(gradient_y(jnp.asarray(x))), to_nhwc(gy_ref))
    np.testing.assert_allclose(np.asarray(flip_lr(jnp.asarray(x))),
                               to_nhwc(torch.flip(t, [3]).numpy()))


def torch_ssim(x, y, C1=1e-4, C2=9e-4):
    """Reference SSIM (multiview_photometric_loss.py:16-55) re-typed in torch."""
    import torch.nn as nn
    pool = nn.AvgPool2d(3, stride=1)
    refl = nn.ReflectionPad2d(1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    mu_x_mu_y = mu_x * mu_y
    mu_x_sq, mu_y_sq = mu_x.pow(2), mu_y.pow(2)
    sigma_x = pool(x.pow(2)) - mu_x_sq
    sigma_y = pool(y.pow(2)) - mu_y_sq
    sigma_xy = pool(x * y) - mu_x_mu_y
    v1 = 2 * sigma_xy + C2
    v2 = sigma_x + sigma_y + C2
    return ((2 * mu_x_mu_y + C1) * v1) / ((mu_x_sq + mu_y_sq + C1) * v2)


def test_ssim_matches_reference(rng):
    x = rng.rand(2, 16, 20, 3).astype(np.float32)
    y = rng.rand(2, 16, 20, 3).astype(np.float32)
    ref = torch_ssim(torch.from_numpy(to_nchw(x)), torch.from_numpy(to_nchw(y))).numpy()
    got = ssim(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5)
