"""
Depth conversions, smoothness, TTA fusion and evaluation metrics (NHWC).

Semantics matched to the reference:
- sigmoid->depth family:    packnet_sfm/utils/post_process_depth.py:13-169
- inv/depth converters:     packnet_sfm/utils/depth.py:103-160
- smoothness:               packnet_sfm/utils/depth.py:165-198
- flipped-TTA fusion:       packnet_sfm/utils/depth.py:201-255
- metrics (garg crop, median scaling, scale_output): utils/depth.py:258-483
- dual-head helpers:        networks/layers/resnet/layers.py:76-180
"""

import math

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.ops.image import (
    gradient_x, gradient_y, flip_lr, interpolate)

########################################################################################################################
# sigmoid -> depth family


def sigmoid_to_inv_depth(sig, min_depth=0.05, max_depth=80.0, use_log_space=False):
    """Bounded inverse depth from sigmoid in [0,1] (linear or log interpolation)."""
    min_inv = 1.0 / max(max_depth, 1e-6)
    max_inv = 1.0 / max(min_depth, 1e-6)
    if use_log_space:
        log_min, log_max = math.log(min_inv), math.log(max_inv)
        return jnp.exp(log_min + (log_max - log_min) * sig)
    return min_inv + (max_inv - min_inv) * sig


def sigmoid_to_depth_linear(sig, min_depth=0.05, max_depth=80.0):
    """depth = 1 / (linear bounded inverse depth + 1e-8)."""
    return 1.0 / (sigmoid_to_inv_depth(sig, min_depth, max_depth) + 1e-8)


def sigmoid_to_depth_log(sig, min_depth=0.05, max_depth=80.0):
    """depth from log-space bounded inverse depth."""
    return 1.0 / (sigmoid_to_inv_depth(sig, min_depth, max_depth, True) + 1e-8)


def disp_to_depth(disp, min_depth, max_depth):
    """monodepth2 sigmoid->depth (reference: layers/resnet/layers.py:12-21)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


def inv2depth(inv_depth):
    """1 / clamp(inv_depth, 1e-6) (lists map elementwise)."""
    if isinstance(inv_depth, (list, tuple)):
        return [inv2depth(x) for x in inv_depth]
    return 1.0 / jnp.clip(inv_depth, a_min=1e-6)


def depth2inv(depth):
    """Inverse depth with zeros preserved for invalid (<=0) pixels."""
    if isinstance(depth, (list, tuple)):
        return [depth2inv(x) for x in depth]
    inv = 1.0 / jnp.clip(depth, a_min=1e-6)
    return jnp.where(depth <= 0.0, 0.0, inv)


########################################################################################################################
# Dual-head (integer + fractional) helpers


def dual_head_to_depth(integer_sig, fractional_sig, max_depth):
    """depth = integer_sig * max_depth + fractional_sig."""
    return integer_sig * max_depth + fractional_sig


def decompose_depth(depth_gt, max_depth):
    """GT -> (integer part / max_depth, fractional part)."""
    integer_m = jnp.floor(depth_gt)
    return integer_m / max_depth, depth_gt - integer_m


def dual_head_to_inv_depth(integer_sig, fractional_sig, max_depth, min_depth=0.5):
    depth = dual_head_to_depth(integer_sig, fractional_sig, max_depth)
    depth = jnp.clip(depth, min_depth, max_depth + 1.0)
    return 1.0 / depth


########################################################################################################################
# Smoothness


def inv_depths_normalize(inv_depths):
    """Normalize each [B,H,W,1] map by its spatial mean."""
    return [d / jnp.clip(d.mean(axis=(1, 2), keepdims=True), a_min=1e-6)
            for d in inv_depths]


def calc_smoothness(inv_depths, images, num_scales):
    """Edge-aware smoothness terms per scale (reference: utils/depth.py:165-198)."""
    inv_norm = inv_depths_normalize(inv_depths)
    sx, sy = [], []
    for i in range(num_scales):
        dgx = gradient_x(inv_norm[i])
        dgy = gradient_y(inv_norm[i])
        wx = jnp.exp(-jnp.mean(jnp.abs(gradient_x(images[i])), axis=3, keepdims=True))
        wy = jnp.exp(-jnp.mean(jnp.abs(gradient_y(images[i])), axis=3, keepdims=True))
        sx.append(dgx * wx)
        sy.append(dgy * wy)
    return sx, sy


########################################################################################################################
# Flipped-TTA fusion


def fuse_inv_depth(inv_depth, inv_depth_hat, method='mean'):
    if method == 'mean':
        return 0.5 * (inv_depth + inv_depth_hat)
    if method == 'max':
        return jnp.maximum(inv_depth, inv_depth_hat)
    if method == 'min':
        return jnp.minimum(inv_depth, inv_depth_hat)
    raise ValueError('Unknown fuse method {}'.format(method))


def post_process_inv_depth(inv_depth, inv_depth_flipped, method='mean'):
    """Blend straight and flipped predictions with a lateral ramp mask."""
    B, H, W, C = inv_depth.shape
    inv_hat = flip_lr(inv_depth_flipped)
    fused = fuse_inv_depth(inv_depth, inv_hat, method)
    xs = jnp.linspace(0.0, 1.0, W, dtype=inv_depth.dtype)
    mask = 1.0 - jnp.clip(20.0 * (xs - 0.05), 0.0, 1.0)
    mask = jnp.broadcast_to(mask[None, None, :, None], inv_depth.shape)
    mask_hat = flip_lr(mask)
    return mask_hat * inv_depth + mask * inv_hat + (1.0 - mask - mask_hat) * fused


########################################################################################################################
# Metrics


def scale_depth(pred, gt_shape, scale_fn):
    """Match predicted depth [B,h,w,1] to GT resolution (reference: utils/depth.py:450-483)."""
    H, W = gt_shape[1], gt_shape[2]
    if scale_fn == 'resize' or scale_fn == '':
        return interpolate(pred, (H, W), mode='bilinear', align_corners=True)
    if scale_fn == 'top-center':
        B, h, w, C = pred.shape
        top, left = H - h, (W - w) // 2
        out = jnp.zeros((B, H, W, C), pred.dtype)
        return jax.lax.dynamic_update_slice(out, pred, (0, top, left, 0))
    raise NotImplementedError('scale_output {} not implemented'.format(scale_fn))


def _masked_median(x, mask):
    """Median of x over mask==True (nan trick; jit-friendly)."""
    vals = jnp.where(mask, x, jnp.nan)
    return jnp.nanmedian(vals)


def _single_image_metrics(gt, pred, valid, use_gt_scale):
    """7 metrics for one image ([H,W] maps, boolean valid mask)."""
    n = jnp.sum(valid)
    safe_n = jnp.maximum(n, 1)

    if use_gt_scale:
        gt_med = _masked_median(gt, valid)
        pr_med = _masked_median(pred, valid)
        scale = gt_med / jnp.maximum(pr_med, 1e-12)
        pred = pred * scale

    gt_s = jnp.where(valid, gt, 1.0)
    pr_s = jnp.where(valid, pred, 1.0)

    def mmean(v):
        return jnp.sum(jnp.where(valid, v, 0.0)) / safe_n

    thresh = jnp.maximum(gt_s / pr_s, pr_s / gt_s)
    a1 = mmean((thresh < 1.25).astype(jnp.float32))
    a2 = mmean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = mmean((thresh < 1.25 ** 3).astype(jnp.float32))

    diff = gt_s - pr_s
    abs_rel = mmean(jnp.abs(diff) / gt_s)
    sq_rel = mmean(diff ** 2 / gt_s)
    rmse = jnp.sqrt(mmean(diff ** 2))
    rmse_log = jnp.sqrt(mmean((jnp.log(gt_s) - jnp.log(pr_s)) ** 2))

    metrics = jnp.stack([abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3])
    # Images without valid pixels contribute zeros (reference behaviour:
    # utils/depth.py "continue" on empty masks).
    return jnp.where(n > 0, metrics, jnp.zeros_like(metrics))


def compute_depth_metrics(gt, pred, min_depth, max_depth, crop='',
                          scale_output='resize', use_gt_scale=True):
    """
    Depth metrics [abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3] averaged over
    the batch. gt/pred are [B,H,W,1]; the garg crop fraction bounds follow the
    reference exactly (utils/depth.py:332-339).
    """
    B, H, W, _ = gt.shape
    pred = scale_depth(pred, gt.shape, scale_output)

    valid = (gt > min_depth) & (gt < max_depth)
    if crop == 'garg':
        y1, y2 = int(0.40810811 * H), int(0.99189189 * H)
        x1, x2 = int(0.03594771 * W), int(0.96405229 * W)
        crop_mask = jnp.zeros((H, W), bool).at[y1:y2, x1:x2].set(True)
        valid = valid & crop_mask[None, :, :, None]

    fn = jax.vmap(lambda g, p, v: _single_image_metrics(
        g[..., 0], p[..., 0], v[..., 0], use_gt_scale))
    per_image = fn(gt, pred, valid)
    return jnp.sum(per_image, axis=0) / B
