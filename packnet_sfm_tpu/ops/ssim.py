"""
SSIM distance, numerics-matched to the reference implementation
(reference: packnet_sfm/losses/multiview_photometric_loss.py:16-55):
reflection-pad(1) + 3x3 stride-1 average pooling for all moments.
NHWC layout.
"""

import jax.numpy as jnp

from packnet_sfm_tpu.ops.image import reflect_pad_2d, avg_pool_3x3


def ssim(x, y, C1=1e-4, C2=9e-4, clamp_variance=False):
    """SSIM map of two [B,H,W,C] images; returns [B,H,W,C].

    clamp_variance enables the numerically-stable low-precision path
    (bf16 inputs). The plain E[x^2]-mu^2 variance estimator cancels
    catastrophically in bf16 (8 mantissa bits on values ~1 -> sigma error
    ~1e-2 >> C2), driving the estimate negative once warped and target
    converge — which flips the SSIM denominator's sign and NaNs the
    backward pass (observed in training).

    Fix (round 3): fp32 accumulation islands. The bf16 speedup comes from
    HBM traffic on the full-res pixel tensors, not from the VPU (fp32-
    native); so keep the INPUTS bf16 and run every moment product and
    pool in fp32 — the casts fuse into the pooling kernels, so the
    memory-bound traffic stays half-width while the cancellation-prone
    arithmetic is exact. This replaces the round-2 centered-statistics
    workaround (shift to 0.45 scale before pooling), which stabilized
    bf16 but still paid bf16 pooling rounding (40-step overfit 0.122 vs
    fp32's 0.090 — BENCH_NOTES). Keep the sigma>=0 projection as a
    backstop against input-quantization residue.
    """
    if clamp_variance:
        # fp32 moment islands over (possibly bf16) pixel inputs
        xp = reflect_pad_2d(x, 1).astype(jnp.float32)
        yp = reflect_pad_2d(y, 1).astype(jnp.float32)
        mu_x = avg_pool_3x3(xp)
        mu_y = avg_pool_3x3(yp)
        sigma_x = jnp.maximum(avg_pool_3x3(xp * xp) - mu_x * mu_x, 0.0)
        sigma_y = jnp.maximum(avg_pool_3x3(yp * yp) - mu_y * mu_y, 0.0)
        sigma_xy = avg_pool_3x3(xp * yp) - mu_x * mu_y
    else:
        xp = reflect_pad_2d(x, 1)
        yp = reflect_pad_2d(y, 1)
        mu_x = avg_pool_3x3(xp)
        mu_y = avg_pool_3x3(yp)
        sigma_x = avg_pool_3x3(xp * xp) - mu_x * mu_x
        sigma_y = avg_pool_3x3(yp * yp) - mu_y * mu_y
        sigma_xy = avg_pool_3x3(xp * yp) - mu_x * mu_y

    mu_xy = mu_x * mu_y
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y

    v1 = 2.0 * sigma_xy + C2
    v2 = sigma_x + sigma_y + C2

    num = (2.0 * mu_xy + C1) * v1
    den = (mu_xx + mu_yy + C1) * v2
    return num / den


def ssim_loss(x, y, C1=1e-4, C2=9e-4, clamp_variance=False):
    """Clamped SSIM distance (1-SSIM)/2 in [0,1] (reference loss form)."""
    return jnp.clip((1.0 - ssim(x, y, C1, C2, clamp_variance)) * 0.5,
                    0.0, 1.0)
