"""Oracle parity for the round-3 SAN micro-optimizations (layers/san.py):

- masked_max_pool's strided-shift maximum vs the lax.reduce_window oracle
  (forward AND gradient — the rewrite exists to avoid select_and_scatter
  in the backward, so the grads must still agree where they are unique)
- MaskedBatchNorm's one-pass uncentered statistics vs the two-pass
  centered-oracle (reference MinkowskiBatchNorm semantics:
  /root/reference/packnet_sfm/networks/layers/minkowski_encoder.py:12-87)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from packnet_sfm_tpu.networks.layers.san import (
    MaskedBatchNorm, MinkowskiEncoder, masked_max_pool, sparsify_depth)

pytestmark = pytest.mark.quick


def _reduce_window_pool(x, mask, window=3, stride=2):
    """Independent strided-shift formulation (oracle only: it measured 1.6x
    slower than reduce_window on v5e, so production uses reduce_window)."""
    pad = window // 2
    B, H, W, C = x.shape
    out_h = (H + 2 * pad - window) // stride + 1
    out_w = (W + 2 * pad - window) // stride + 1

    def slices(xp):
        for di in range(window):
            for dj in range(window):
                yield xp[:, di:di + stride * (out_h - 1) + 1:stride,
                         dj:dj + stride * (out_w - 1) + 1:stride, :]

    negp = jnp.pad(jnp.where(mask > 0, x, -jnp.inf),
                   ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   constant_values=-jnp.inf)
    maskp = jnp.pad(mask, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    pooled = functools.reduce(jnp.maximum, slices(negp))
    pooled_mask = functools.reduce(jnp.maximum, slices(maskp))
    return jnp.where(pooled_mask > 0, pooled, 0.0), pooled_mask


@pytest.mark.parametrize('shape,window,stride', [
    ((2, 16, 24, 4), 3, 2),
    ((1, 15, 21, 3), 3, 2),   # odd sizes exercise the ceil output shape
    ((2, 12, 12, 2), 3, 1),
])
def test_masked_max_pool_matches_reduce_window(shape, window, stride):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    mask = (rng.rand(*shape[:3], 1) < 0.3).astype(np.float32)
    x = x * mask  # the module invariant: inactive sites hold 0
    got, got_m = masked_max_pool(jnp.asarray(x), jnp.asarray(mask),
                                 window, stride)
    want, want_m = _reduce_window_pool(jnp.asarray(x), jnp.asarray(mask),
                                       window, stride)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_masked_max_pool_gradient_matches():
    rng = np.random.RandomState(1)
    # distinct values -> unique argmax -> both formulations route the same
    x = (rng.permutation(16 * 24).reshape(1, 16, 24, 1) / 7.0).astype(
        np.float32)
    mask = (rng.rand(1, 16, 24, 1) < 0.4).astype(np.float32)
    x = x * mask

    def loss_new(x):
        p, _ = masked_max_pool(x, jnp.asarray(mask))
        return jnp.sum(p * jnp.cos(jnp.arange(p.size).reshape(p.shape)))

    def loss_old(x):
        p, _ = _reduce_window_pool(x, jnp.asarray(mask))
        return jnp.sum(p * jnp.cos(jnp.arange(p.size).reshape(p.shape)))

    g_new = jax.grad(loss_new)(jnp.asarray(x))
    g_old = jax.grad(loss_old)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                               atol=1e-6)


def test_masked_batchnorm_one_pass_matches_two_pass():
    rng = np.random.RandomState(2)
    B, H, W, C = 2, 12, 20, 8
    mask = (rng.rand(B, H, W, 1) < 0.25).astype(np.float32)
    # large offset exercises the uncentered-form cancellation
    x = (rng.randn(B, H, W, C).astype(np.float32) + 50.0) * mask

    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask), True)
    y, mutated = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask), True,
                          mutable=['batch_stats'])

    # two-pass oracle over active sites only
    cnt = max(mask.sum() * 1.0, 1.0)
    mean = (x * mask).sum(axis=(0, 1, 2)) / cnt
    var = (((x - mean) ** 2) * mask).sum(axis=(0, 1, 2)) / cnt
    want = (x - mean) / np.sqrt(var + 1e-5) * mask
    # uncentered one-pass variance at mean offset 50 cancels ~mean^2 * eps
    # ~ 3e-4 absolute in var (the same bound flax.linen.BatchNorm accepts);
    # tolerance reflects that, not a logic difference
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-3, atol=2e-3)

    # running stats blend with momentum 0.9 from (0, 1) init
    np.testing.assert_allclose(np.asarray(mutated['batch_stats']['mean']),
                               0.1 * mean, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mutated['batch_stats']['var']),
                               0.9 * 1.0 + 0.1 * var, rtol=2e-3, atol=2e-3)


def test_masked_batchnorm_inactive_sites_stay_zero():
    rng = np.random.RandomState(3)
    mask = (rng.rand(1, 8, 8, 1) < 0.3).astype(np.float32)
    x = rng.randn(1, 8, 8, 4).astype(np.float32) * mask
    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask), True)
    y, _ = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask), True,
                    mutable=['batch_stats'])
    np.testing.assert_array_equal(np.asarray(y) * (1 - mask),
                                  np.zeros_like(np.asarray(y)))


def test_minkowski_encoder_stages_preserve_zero_invariant():
    """Every stage output must be exactly zero at inactive sites — the
    invariant the whole redundant-multiply elimination rests on."""
    rng = np.random.RandomState(4)
    depth = (rng.rand(1, 32, 48, 1) * 70 *
             (rng.rand(1, 32, 48, 1) < 0.1)).astype(np.float32)
    enc = MinkowskiEncoder(channels=(8, 8, 16))
    d, mask = sparsify_depth(jnp.asarray(depth))

    def all_stages(enc_module, f, m):
        out = []
        for i in range(3):
            f, m = enc_module(i, f, m, True)
            out.append((f, m))
        return out

    variables = nn.init(all_stages, enc)(jax.random.PRNGKey(0), d, mask)
    stages, _ = nn.apply(all_stages, enc, mutable=['batch_stats'])(
        variables, d, mask)
    for f, m in stages:
        f, m = np.asarray(f), np.asarray(m)
        assert set(np.unique(m)) <= {0.0, 1.0}
        np.testing.assert_array_equal(f * (1 - m), np.zeros_like(f))
