"""Parity of the block-sparse masked conv kernel (ops/pallas/san_conv.py)
against the dense XLA oracle (= the masked-dense SAN formulation,
networks/layers/san.py), interpreter mode on CPU.

Covers: values for k=3/5 at SAN-like channel widths, row-structured and
fully-empty masks, tile activity flags, non-multiple-of-8 heights, and the
custom VJP (dx / dkernel / dbias) against autodiff of the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from packnet_sfm_tpu.ops.pallas.san_conv import (
    masked_conv2d, masked_conv2d_pallas, tile_activity, _dense_oracle,
    TILE_ROWS)

pytestmark = pytest.mark.quick


def _row_mask(rng, B, H, W, horizon_frac=0.4, fill=0.3):
    """KITTI-like: empty above the horizon, scattered returns below."""
    m = np.zeros((B, H, W, 1), np.float32)
    h0 = int(H * horizon_frac)
    m[:, h0:] = (rng.rand(B, H - h0, W, 1) < fill).astype(np.float32)
    return m


def _setup(rng, B, H, W, Cin, Cout, k, mask=None):
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    if mask is None:
        mask = _row_mask(rng, B, H, W)
    x = x * mask  # SAN invariant: inputs are pre-masked
    kern = (rng.randn(k, k, Cin, Cout) * 0.1).astype(np.float32)
    bias = (rng.randn(Cout) * 0.1).astype(np.float32)
    return (jnp.asarray(v) for v in (x, mask, kern, bias))


@pytest.mark.parametrize('k', [3, 5])
@pytest.mark.parametrize('shape', [(2, 24, 128, 64, 64), (1, 20, 96, 32, 16)])
def test_forward_matches_dense(k, shape):
    B, H, W, Cin, Cout = shape
    rng = np.random.RandomState(0)
    x, mask, kern, bias = _setup(rng, B, H, W, Cin, Cout, k)
    want = _dense_oracle(x, kern, bias, mask)
    got = masked_conv2d_pallas(x, mask, kern, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_empty_tiles_skipped_and_zero():
    B, H, W, Cin, Cout = 1, 32, 128, 64, 64
    rng = np.random.RandomState(1)
    mask = np.zeros((B, H, W, 1), np.float32)
    mask[:, 24:] = 1.0  # only the last row-tile active
    x, mask_j, kern, bias = _setup(rng, B, H, W, Cin, Cout, 3, mask=mask)
    flags = tile_activity(mask_j, 3)
    assert flags.shape == (B, H // TILE_ROWS)
    np.testing.assert_array_equal(np.asarray(flags), [[0, 0, 0, 1]])
    got = masked_conv2d_pallas(x, mask_j, kern, bias, interpret=True)
    # inactive tiles are exactly zero (not just small)
    assert float(jnp.abs(got[:, :24]).max()) == 0.0
    want = _dense_oracle(x, kern, bias, mask_j)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_all_empty_mask():
    B, H, W, Cin, Cout = 1, 16, 128, 32, 32
    rng = np.random.RandomState(2)
    mask = np.zeros((B, H, W, 1), np.float32)
    x, mask_j, kern, bias = _setup(rng, B, H, W, Cin, Cout, 3, mask=mask)
    got = masked_conv2d_pallas(x, mask_j, kern, bias, interpret=True)
    assert float(jnp.abs(got).max()) == 0.0


def test_grad_matches_dense():
    B, H, W, Cin, Cout = 1, 24, 128, 32, 32
    k = 3
    rng = np.random.RandomState(3)
    x, mask, kern, bias = _setup(rng, B, H, W, Cin, Cout, k)
    flags = tile_activity(mask, k)
    g = jnp.asarray(rng.randn(B, H, W, Cout).astype(np.float32))

    def loss_pallas(x_, k_, b_):
        return jnp.sum(masked_conv2d(x_, mask, k_, b_, flags, True) * g)

    def loss_dense(x_, k_, b_):
        return jnp.sum(_dense_oracle(x_, k_, b_, mask) * g)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, kern, bias)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(x, kern, bias)
    for a, b, name in zip(gp, gd, ('dx', 'dkernel', 'dbias')):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_grad_dx_halo_across_tiles():
    """Cotangent in one tile must propagate dx into the neighbour tile's
    halo rows (the dilated-flags path)."""
    B, H, W, Cin, Cout = 1, 32, 128, 16, 16
    k = 5
    rng = np.random.RandomState(4)
    mask = np.zeros((B, H, W, 1), np.float32)
    mask[:, 8:16] = 1.0  # second tile only
    x, mask_j, kern, bias = _setup(rng, B, H, W, Cin, Cout, k, mask=mask)
    flags = tile_activity(mask_j, k)
    g = jnp.asarray(rng.randn(B, H, W, Cout).astype(np.float32))

    def loss_pallas(x_):
        return jnp.sum(masked_conv2d(x_, mask_j, kern, bias, flags, True) * g)

    def loss_dense(x_):
        return jnp.sum(_dense_oracle(x_, kern, bias, mask_j) * g)

    dxp = jax.grad(loss_pallas)(x)
    dxd = jax.grad(loss_dense)(x)
    # rows 6-7 (tile 0) receive gradient only through the halo
    assert float(jnp.abs(dxd[:, 6:8]).max()) > 0
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxd),
                               atol=1e-3, rtol=1e-3)
