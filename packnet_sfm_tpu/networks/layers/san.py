"""
Sparse Auxiliary Network (SAN) LiDAR branch — TPU-native MinkowskiEngine
replacement.

The reference uses MinkowskiEngine sparse convolutions over the ~5%-fill set
of projected-LiDAR pixels (reference: networks/layers/minkowski.py:32-78,
minkowski_encoder.py:11-172). On TPU we re-design this as *masked dense*
convolutions: a sparse conv's output at an active site equals a dense conv of
the zero-filled (masked) feature map evaluated there, so

    sparse_conv(x)  ==  mask_out * dense_conv(mask_in * x)

which vectorizes perfectly on the MXU and — at 5% fill of small feature maps
— costs less than gather/scatter bookkeeping would. Masked BatchNorm
normalizes over active sites only (matching MinkowskiBatchNorm), and the
stride-2 "pooling" is a masked max-pool with a mask OR-reduction.

TPU performance notes (round 3):
- Everything in this stack maintains the invariant "inactive sites hold
  exactly 0", so the masked tensors ARE the dense tensors and almost all
  `* mask` multiplies are algebraically redundant. The only places a mask
  multiply is required: after a conv (the conv smears values into inactive
  sites) and after a BatchNorm affine (bias shifts inactive zeros).
- MaskedBatchNorm computes sum(x) and sum(x*x) in ONE pass (the zero
  invariant makes the mask multiplies in the statistics free), in fp32,
  with var = E[x^2] - E[x]^2 — the same uncentered one-pass form flax's
  BatchNorm uses. The previous two-pass (mean, then (x-mean)^2) serialized
  two full HBM sweeps per BN and was 25% of the flagship step's device time
  (BENCH_NOTES round-2 profile).
- masked_max_pool uses lax.reduce_window (see its docstring: the 9-way
  strided-slice alternative was A/B'd in round 3 and lost, 37.2 vs
  23.0 ms/step — select_and_scatter in the backward is NOT the
  bottleneck at these shapes; keep reduce_window).

Structure matched to the reference:
- MinkConv2D: optional pool(3, s2) -> 3 parallel conv stacks (1/2/3 convs) ->
  sum -> BN+ReLU (minkowski_encoder.py:12-87)
- MinkowskiEncoder: per-scale stage stack with kernel sizes [5,5,3,3,3] and
  stride 2, plus optional per-scale FiLM generators (AdaptiveAvgPool + 1x1)
  (minkowski_encoder.py:89-172)
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

XAVIER = nn.initializers.glorot_uniform()

# Masked-conv backend switch ('auto' | 'xla'), overridable for A/B benches.
# 'auto' routes eligible convs (TPU, k in {3,5}, Cin >= 16) through the
# block-sparse Pallas kernel (ops/pallas/san_conv.py) that skips row-tiles
# with no active LiDAR sites — projected LiDAR is empty above the horizon
# at every scale, work XLA cannot skip. Ineligible convs (the 1-channel
# stack entries, CPU) use the dense masked formulation; both share the
# same 'Conv_i/{kernel,bias}' parameters.
# Default 'xla': the round-3 kernel measured 339.7 vs 125.1 ms/step on the
# selfsup workload (parity-exact but slow — per-tap small matmuls underfeed
# the MXU); flip to 'auto' only when the microbench
# (scripts/bench_san_conv.py) shows a win at the SAN shapes.
SAN_CONV_IMPL = 'xla'


def _pallas_conv_eligible(x, kernel_size):
    return (SAN_CONV_IMPL == 'auto'
            and jax.default_backend() == 'tpu'
            and kernel_size in (3, 5)
            and x.shape[-1] >= 16
            and x.shape[2] % 8 == 0)


class _MaskedConv(nn.Module):
    """One masked conv: out = (conv(x) + b) * mask.

    Same parameter names/shapes as flax nn.Conv ('kernel' HWIO, 'bias') so
    checkpoints are layout-identical across backends; instantiated with
    name='Conv_i' to keep the historical parameter paths.
    """
    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, flags=None):
        k = self.kernel_size
        cin = x.shape[-1]
        kern = self.param('kernel', XAVIER, (k, k, cin, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        if _pallas_conv_eligible(x, k):
            from packnet_sfm_tpu.ops.pallas.san_conv import (
                masked_conv2d, tile_activity)
            if flags is None:
                flags = tile_activity(mask, k)
            return masked_conv2d(x, mask.astype(x.dtype),
                                 kern.astype(x.dtype),
                                 bias.astype(x.dtype), flags)
        y = jax.lax.conv_general_dilated(
            x, kern.astype(x.dtype), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return (y + bias.astype(y.dtype)) * mask


def sparsify_depth(depth):
    """[B,H,W,1] depth -> (features, mask) with mask = depth > 0."""
    mask = (depth > 0.0).astype(depth.dtype)
    return depth * mask, mask


def active_row_window(mask, Hw, align=32, bottom_margin=63):
    """Choose an `align`-aligned row start s so [s, s+Hw) covers the
    active band of `mask` [B,H,W,1].

    Projected LiDAR is row-structured: everything above the horizon is
    empty at every pyramid level (KITTI: ~40% of rows), which is work a
    dense conv cannot skip. The caller crops (d, mask) ONCE to this window
    and runs the whole SAN stage stack on the cropped tensors (see
    ResNetSAN01.run_network), pasting each stage's output back at row
    s/2^(i+1) — hence align=32 so every level's pooling grid stays aligned
    with the full computation's.

    Exactness: values outside the active set are zero in both the cropped
    and the full computation, so the crop is EXACT when (a) s <= first
    active row (pooled rows above the window top can then never be active,
    by induction over the stride-2 OR-pools) and (b) the window bottom is
    either the image edge (the full computation clamps identically) or
    >= last active row + 63 (each of the 5 stride-2 pools can push the
    band's pooled bottom one level-local row — 2^k absolute rows — below).
    When the band + margins exceed Hw the bottom is prioritized (near
    LiDAR returns are the dense, information-rich ones) and any active
    sites left outside are dropped from the branch and counted.

    Returns (s: int32 scalar, dropped: f32 scalar count of active sites
    outside the window).
    """
    H = mask.shape[1]
    rows = jnp.sum(mask, axis=(0, 2, 3))                 # [H]
    idx = jnp.arange(H)
    act = rows > 0
    r0 = jnp.min(jnp.where(act, idx, H))
    r1 = jnp.max(jnp.where(act, idx, -1))
    s = jnp.clip((r0 // align) * align, 0, H - Hw)
    # shift down (ceil to alignment) if the bottom margin would be cut
    need_bottom = jnp.minimum(r1 + bottom_margin, H)
    s = jnp.where(s + Hw < need_bottom,
                  jnp.clip(-(-(need_bottom - Hw) // align) * align,
                           0, H - Hw), s)
    in_win = (idx >= s) & (idx < s + Hw)
    dropped = jnp.sum(jnp.where(in_win, 0.0, rows))
    return s, dropped


def calibrate_san_row_window(dataset, k=16, align=32, bottom_margin=63,
                             safety_rows=32):
    """Pick a `san_row_window` fraction from the DATA instead of by hand.

    Samples up to `k` items from `dataset` (anything indexable returning a
    sample dict; items without 'input_depth' disable the crop), measures the
    projected-LiDAR active row band across them, and returns the smallest
    fraction whose 32-aligned window covers (band + the bottom margin
    active_row_window needs for exactness + one `safety_rows` band for
    sample variance beyond the calibration set). Returns 0.0 (crop
    disabled) when any sample lacks LiDAR or the window would not be
    smaller than the image.

    The trainer runs this when `model.depth_net.san_row_window == -1`
    ('auto'): the runtime window START stays per-batch (traced s from the
    mask, active_row_window above); only the static SIZE is calibrated
    here. Out-of-window points at train time are still counted by the
    'san_dropped' intermediate, so a miscalibration is observable.
    """
    import numpy as np
    n = len(dataset)
    if n == 0:
        return 0.0
    take = np.linspace(0, n - 1, min(k, n)).astype(int)
    r0, r1, H = None, None, None
    for i in take:
        sample = dataset[int(i)]
        d = sample.get('input_depth')
        if d is None:
            return 0.0
        d = np.asarray(d)
        if d.ndim == 3:                       # [H,W,1] or [1,H,W]
            d = d[..., 0] if d.shape[-1] == 1 else d[0]
        H = d.shape[0]
        rows = np.flatnonzero((d > 0).any(axis=1))
        if rows.size == 0:
            continue
        r0 = rows[0] if r0 is None else min(r0, rows[0])
        r1 = rows[-1] if r1 is None else max(r1, rows[-1])
    if r0 is None or H is None:
        return 0.0
    top = (r0 // align) * align
    bottom = min(H, r1 + 1 + bottom_margin + safety_rows)
    Hw = -(-(bottom - top) // align) * align
    if Hw >= H or Hw <= 0:
        return 0.0
    # consumer computes int(H * frac) // 32 * 32 — bias by half a row so
    # float truncation can't lose the last aligned block
    return float((Hw + 0.5) / H)


def crop_rows(x, s, Hw):
    """dynamic row crop [B,H,W,C] -> [B,Hw,W,C] starting at traced s."""
    return jax.lax.dynamic_slice_in_dim(x, s, Hw, axis=1)


def paste_rows(x, s, H):
    """Paste [B,Hw,W,C] into a zero canvas of height H at traced row s."""
    B, Hw, W, C = x.shape
    canvas = jnp.zeros((B, H, W, C), x.dtype)
    return jax.lax.dynamic_update_slice_in_dim(canvas, x, s, axis=1)


def masked_max_pool(x, mask, window=3, stride=2):
    """Max-pool active features; mask pools by OR (any active in window).

    lax.reduce_window on purpose: a measured A/B (round 3) found the
    "9 strided-slice maximum" alternative 1.6x SLOWER end-to-end on v5e
    (37.2 vs 23.0 ms on the isolated SAN stack) — XLA:TPU's reduce_window
    + select_and_scatter pair beats strided slicing/padding chains here.
    Expects x == 0 at inactive sites; output keeps that invariant.
    """
    pad = ((0, 0), (window // 2,) * 2, (window // 2,) * 2, (0, 0))
    neg = jnp.where(mask > 0, x, -jnp.inf)
    pooled = jax.lax.reduce_window(
        neg, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1), padding=pad)
    pooled_mask = jax.lax.reduce_window(
        mask, 0.0, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1), padding=pad)
    return jnp.where(pooled_mask > 0, pooled, 0.0), pooled_mask


class MaskedBatchNorm(nn.Module):
    """BatchNorm over active sites only (MinkowskiBatchNorm semantics).

    Requires the input to be PRE-MASKED (x == 0 at inactive sites) — the
    invariant every producer in this module maintains. Statistics are then
    plain sums over the whole tensor, computed in ONE fp32 pass with the
    uncentered variance form (matching flax.linen.BatchNorm's numerics).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train=True):
        C = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))

        if train:
            xf = x.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
            # x is zero at inactive sites -> sums over ALL sites equal sums
            # over active sites; s1/s2 fuse into one sweep of x.
            mean = jnp.sum(xf, axis=(0, 1, 2)) / cnt
            mean2 = jnp.sum(xf * xf, axis=(0, 1, 2)) / cnt
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y * mask


class _MaskedConvSeq(nn.Module):
    """Sequence of masked convs with BN+ReLU between (one stack of MinkConv2D).

    Input must be pre-masked; output is masked. The only mask multiply per
    conv is on the conv OUTPUT (the conv spreads values into inactive
    sites); BN re-masks after its affine, and relu preserves zeros.
    """
    widths: Sequence[int]
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train=True):
        n = len(self.widths)
        for i, w in enumerate(self.widths):
            # per-conv tile_activity calls are identical expressions over
            # the same mask -> XLA CSEs them to one reduction
            x = _MaskedConv(w, self.kernel_size, self.dtype,
                            name=f'Conv_{i}')(x.astype(self.dtype), mask)
            if i < n - 1:
                x = nn.relu(MaskedBatchNorm()(x, mask, train))
        return x


class MinkConv2D(nn.Module):
    """Masked-dense equivalent of the reference MinkConv2D block."""
    features: int
    kernel_size: int = 3
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train=True):
        if self.stride != 1:
            x, mask = masked_max_pool(x, mask, 3, self.stride)
        f, k = self.features, self.kernel_size
        x1 = _MaskedConvSeq([f], k, self.dtype)(x, mask, train)
        x2 = _MaskedConvSeq([2 * f, f], k, self.dtype)(x, mask, train)
        x3 = _MaskedConvSeq([2 * f, 2 * f, f], k, self.dtype)(x, mask, train)
        y = x1 + x2 + x3  # each stack output is masked -> the sum is
        y = nn.relu(MaskedBatchNorm()(y, mask, train))
        return y, mask


class MinkowskiEncoder(nn.Module):
    """
    Multi-scale sparse depth encoder with optional depth-aware FiLM.

    Call `stage(i, feats, mask, train)` per pyramid level; returns
    (dense_features, new_mask[, gamma, beta]). Unlike the stateful reference
    (prep/forward counter), stages are addressed explicitly — functional and
    jit-friendly.
    """
    channels: Sequence[int]
    rgb_channels: Sequence[int] = None  # per-scale FiLM widths (0 = disabled)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ks = [5, 5] + [3] * (len(self.channels) - 1)
        self.mconvs = [
            MinkConv2D(self.channels[i], ks[i], 2, self.dtype,
                       name=f'mconv_{i}')
            for i in range(len(self.channels))]
        films = {}
        if self.rgb_channels is not None:
            for i, rgb_ch in enumerate(self.rgb_channels):
                if rgb_ch and rgb_ch > 0:
                    films[str(i)] = nn.Conv(rgb_ch * 2, (1, 1),
                                            kernel_init=XAVIER,
                                            name=f'film_{i}')
        self.films = films

    def __call__(self, scale, feats, mask, train=True, pool_denom=None):
        """pool_denom: when the caller row-crops the stage (see
        active_row_window), pass the FULL-map element count H*W of this
        level so the FiLM AdaptiveAvgPool mean matches the uncropped
        computation (rows outside the window are zero and contribute only
        to the denominator)."""
        dense, mask = self.mconvs[scale](feats, mask, train)
        # MinkConv2D output is already densified (zeros at inactive sites)
        if str(scale) in self.films:
            if pool_denom is None:
                pooled = dense.mean(axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
            else:
                pooled = dense.sum(axis=(1, 2), keepdims=True) / pool_denom
            params = self.films[str(scale)](pooled)
            gamma, beta = jnp.split(params, 2, axis=-1)
            return dense, mask, gamma, beta
        return dense, mask
