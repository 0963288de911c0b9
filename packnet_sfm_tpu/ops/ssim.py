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
    backward pass (observed in training). Fix: center the inputs at 0.45
    (the image-mean scale) before pooling — sigma is shift-invariant, and
    E[(x-c)^2] lives at variance scale (~1e-2) where bf16's relative error
    is harmless — plus a max(sigma, 0) projection for any residue. fp32
    stays on the uncentered form for strict reference parity.
    """
    if clamp_variance:
        # shift-invariant variances from centered values (bf16-safe)
        c = jnp.asarray(0.45, x.dtype)
        xp = reflect_pad_2d(x - c, 1)
        yp = reflect_pad_2d(y - c, 1)
        mu_xc = avg_pool_3x3(xp)
        mu_yc = avg_pool_3x3(yp)
        sigma_x = jnp.maximum(avg_pool_3x3(xp * xp) - mu_xc * mu_xc, 0.0)
        sigma_y = jnp.maximum(avg_pool_3x3(yp * yp) - mu_yc * mu_yc, 0.0)
        sigma_xy = avg_pool_3x3(xp * yp) - mu_xc * mu_yc
        mu_x = mu_xc + c
        mu_y = mu_yc + c
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
