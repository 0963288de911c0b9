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

    clamp_variance: project the E[x^2]-mu^2 variance estimates onto >= 0.
    A no-op in exact arithmetic; REQUIRED for bf16 inputs, where rounding of
    E[x^2] (8 mantissa bits) drives the estimate negative once warped and
    target converge, flipping the SSIM denominator's sign and NaN-ing the
    backward pass (observed in training; fp32 stays unclamped for strict
    reference parity).
    """
    xp = reflect_pad_2d(x, 1)
    yp = reflect_pad_2d(y, 1)

    mu_x = avg_pool_3x3(xp)
    mu_y = avg_pool_3x3(yp)

    mu_xy = mu_x * mu_y
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y

    sigma_x = avg_pool_3x3(xp * xp) - mu_xx
    sigma_y = avg_pool_3x3(yp * yp) - mu_yy
    sigma_xy = avg_pool_3x3(xp * yp) - mu_xy
    if clamp_variance:
        sigma_x = jnp.maximum(sigma_x, 0.0)
        sigma_y = jnp.maximum(sigma_y, 0.0)

    v1 = 2.0 * sigma_xy + C2
    v2 = sigma_x + sigma_y + C2

    num = (2.0 * mu_xy + C1) * v1
    den = (mu_xx + mu_yy + C1) * v2
    return num / den


def ssim_loss(x, y, C1=1e-4, C2=9e-4, clamp_variance=False):
    """Clamped SSIM distance (1-SSIM)/2 in [0,1] (reference loss form)."""
    return jnp.clip((1.0 - ssim(x, y, C1, C2, clamp_variance)) * 0.5,
                    0.0, 1.0)
