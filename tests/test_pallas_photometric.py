"""Fused Pallas photometric kernel: forward + analytic VJP vs XLA autodiff
(kernels run in interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.ops.pallas.photometric import (
    photometric_map_pallas, photometric_map_xla)

B, H, W = 2, 16, 24


@pytest.fixture
def xy():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    return x, y


def test_forward_matches_xla(xy):
    x, y = xy
    ref = photometric_map_xla(x, y)
    got = photometric_map_pallas(x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_vjp_matches_autodiff(xy):
    x, y = xy
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))

    def loss_ref(x, y):
        return (photometric_map_xla(x, y) * g).sum()

    def loss_pal(x, y):
        return (photometric_map_pallas(x, y) * g).sum()

    ref_dx, ref_dy = jax.grad(loss_ref, argnums=(0, 1))(x, y)
    got_dx, got_dy = jax.grad(loss_pal, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(ref_dx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dy), np.asarray(ref_dy),
                               rtol=1e-4, atol=1e-5)


def test_vjp_similar_images(xy):
    """Gradients stay correct when x ~= y (ssim -> 1, clamp boundary)."""
    x, _ = xy
    y = x + 0.01
    g = jnp.ones((B, H, W, 1), jnp.float32)

    ref = jax.grad(lambda a, b: (photometric_map_xla(a, b) * g).sum(),
                   argnums=(0, 1))(x, y)
    got = jax.grad(lambda a, b: (photometric_map_pallas(a, b) * g).sum(),
                   argnums=(0, 1))(x, y)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_multi_tile_nondivisible():
    """H spanning multiple kernel tiles with a ragged tail."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 150, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 150, 32, 3).astype(np.float32))
    g = jnp.asarray(rng.rand(1, 150, 32, 1).astype(np.float32))
    ref_v = photometric_map_xla(x, y)
    got_v = photometric_map_pallas(x, y)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-6)
    ref = jax.grad(lambda a, b: (photometric_map_xla(a, b) * g).sum(),
                   argnums=(0, 1))(x, y)
    got = jax.grad(lambda a, b: (photometric_map_pallas(a, b) * g).sum(),
                   argnums=(0, 1))(x, y)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)
