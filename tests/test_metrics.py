"""Golden tests for depth metrics against the reference formulas (re-typed
in numpy from utils/depth.py:258-447) and for TTA fusion."""

import numpy as np
import pytest

import jax.numpy as jnp

from packnet_sfm_tpu.ops.depth import (

    compute_depth_metrics, post_process_inv_depth, scale_depth,
    sigmoid_to_inv_depth, sigmoid_to_depth_linear, sigmoid_to_depth_log)

pytestmark = pytest.mark.quick


def np_reference_metrics(gt, pred, min_depth, max_depth, crop, use_gt_scale):
    """Reference compute_depth_metrics re-typed in numpy (per image, summed,
    divided by batch size; empty masks contribute zero)."""
    B, H, W, _ = gt.shape
    if crop == 'garg':
        crop_mask = np.zeros((H, W), bool)
        y1, y2 = int(0.40810811 * H), int(0.99189189 * H)
        x1, x2 = int(0.03594771 * W), int(0.96405229 * W)
        crop_mask[y1:y2, x1:x2] = True
    totals = np.zeros(7)
    for i in range(B):
        g = gt[i, ..., 0]
        p = pred[i, ..., 0]
        valid = (g > min_depth) & (g < max_depth)
        if crop == 'garg':
            valid &= crop_mask
        if valid.sum() == 0:
            continue
        g, p = g[valid], p[valid]
        if use_gt_scale:
            p = p * np.median(g) / np.median(p)
        thresh = np.maximum(g / p, p / g)
        a1 = (thresh < 1.25).mean()
        a2 = (thresh < 1.25 ** 2).mean()
        a3 = (thresh < 1.25 ** 3).mean()
        diff = g - p
        totals += [np.mean(np.abs(diff) / g), np.mean(diff ** 2 / g),
                   np.sqrt(np.mean(diff ** 2)),
                   np.sqrt(np.mean((np.log(g) - np.log(p)) ** 2)),
                   a1, a2, a3]
    return totals / B


@pytest.mark.parametrize('crop,use_gt_scale', [
    ('', False), ('garg', False), ('', True), ('garg', True)])
def test_metrics_match_reference(crop, use_gt_scale):
    rng = np.random.RandomState(0)
    B, H, W = 3, 40, 60
    gt = rng.rand(B, H, W, 1).astype(np.float32) * 12
    gt[rng.rand(B, H, W, 1) < 0.5] = 0.0
    pred = (rng.rand(B, H, W, 1).astype(np.float32) * 11 + 0.5)
    got = np.asarray(compute_depth_metrics(
        jnp.asarray(gt), jnp.asarray(pred), 0.5, 15.0, crop=crop,
        scale_output='resize', use_gt_scale=use_gt_scale))
    ref = np_reference_metrics(gt, pred, 0.5, 15.0, crop, use_gt_scale)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_metrics_empty_mask_contributes_zero():
    gt = np.zeros((2, 10, 10, 1), np.float32)
    gt[0] = 5.0  # second image has no valid pixels
    pred = np.full((2, 10, 10, 1), 5.0, np.float32)
    m = np.asarray(compute_depth_metrics(
        jnp.asarray(gt), jnp.asarray(pred), 0.5, 15.0, use_gt_scale=False))
    # perfect prediction for image 0; zeros for image 1 -> a1 = 0.5
    assert m[4] == pytest.approx(0.5)
    assert m[0] == pytest.approx(0.0, abs=1e-6)


def test_scale_depth_top_center():
    pred = np.ones((1, 4, 6, 1), np.float32)
    out = np.asarray(scale_depth(jnp.asarray(pred), (1, 8, 10, 1),
                                 'top-center'))
    assert out.shape == (1, 8, 10, 1)
    # bottom 4 rows, horizontally centered cols 2..7
    assert out[0, 4:, 2:8, 0].min() == 1.0
    assert out[0, :4].max() == 0.0
    assert out[0, :, :2].max() == 0.0


def test_post_process_inv_depth_reference_formula():
    rng = np.random.RandomState(1)
    B, H, W = 1, 8, 16
    inv = rng.rand(B, H, W, 1).astype(np.float32)
    inv_f = rng.rand(B, H, W, 1).astype(np.float32)
    got = np.asarray(post_process_inv_depth(jnp.asarray(inv),
                                            jnp.asarray(inv_f)))
    inv_hat = inv_f[:, :, ::-1]
    fused = 0.5 * (inv + inv_hat)
    xs = np.linspace(0, 1, W, dtype=np.float32)
    mask = 1.0 - np.clip(20.0 * (xs - 0.05), 0, 1)
    mask = np.broadcast_to(mask[None, None, :, None], inv.shape)
    mask_hat = mask[:, :, ::-1]
    ref = mask_hat * inv + mask * inv_hat + (1 - mask - mask_hat) * fused
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_sigmoid_conversions_reference_values():
    """Docstring examples from utils/post_process_depth.py."""
    sig = jnp.asarray([0.0, 0.5, 1.0])
    lin = np.asarray(sigmoid_to_inv_depth(sig, 0.05, 80.0, False))
    np.testing.assert_allclose(lin, [0.0125, 10.00625, 20.0], rtol=1e-5)
    d_lin = np.asarray(sigmoid_to_depth_linear(sig, 0.05, 80.0))
    np.testing.assert_allclose(d_lin, [80.0, 0.0999, 0.05], rtol=1e-3)
    d_log = np.asarray(sigmoid_to_depth_log(sig, 0.05, 80.0))
    np.testing.assert_allclose(d_log, [80.0, 2.0, 0.05], rtol=1e-3)
