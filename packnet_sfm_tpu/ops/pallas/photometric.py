"""
Fused photometric-map Pallas kernel (SSIM + L1) with analytic custom VJP.

Motivation (measured, single v5e chip): the self-supervised step runs ~6x
slower per image than the supervised-only step (408 vs 2461 img/s at
192x640) and the photometric loss section is memory-bound — the XLA
composition of SSIM makes ~15+ HBM round-trips per (scale, context) for
pads, five 3x3 box filters and elementwise chains
(reference math: losses/multiview_photometric_loss.py:16-55,218-247).

This kernel computes, in ONE pass over VMEM-resident tiles,

    photo(p) = alpha * mean_c clamp01((1 - SSIM_c(p)) / 2)
             + (1-alpha) * mean_c |x_c(p) - y_c(p)|

from reflect-padded inputs, and implements the backward pass analytically
via the raw-moment decomposition (m1=E[x], m2=E[y], m3=E[x^2], m4=E[y^2],
m5=E[xy], each a 3x3 box mean):

    S = N/D,  N = (2 m1 m2 + C1)(2(m5 - m1 m2) + C2)
              D = (m1^2 + m2^2 + C1)(m3 - m1^2 + m4 - m2^2 + C2)

    dL/dxp(q) = 1/9 [ full_boxsum(G S1)(q) + 2 xp(q) full_boxsum(G S3)(q)
                      + yp(q) full_boxsum(G S5)(q) ] + L1 term,

with S1 = dS/dm1, S3 = dS/dm3, S5 = dS/dm5 (and the symmetric y-side), and
G the upstream gradient folded with the clamp mask and -alpha/6 factor.
The reflect-pad fold is left to JAX autodiff (the custom-VJP boundary sits
AFTER jnp.pad), so the kernels only ever see zero-padding semantics.

Layout: planes [B, 3, Hp, Wp] (channels off the lane dim); grid over B.
Verified against the XLA composition and its autodiff in
tests/test_pallas_photometric.py. Enable with cfg.tpu.use_pallas.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def _interpret():
    """Interpreter mode off-TPU (CPU tests run the kernels interpreted)."""
    return jax.default_backend() != 'tpu'


def _boxsum_valid(v, H, W):
    """Sum of 3x3 windows: [*, H+2, W+2] -> [*, H, W] (valid)."""
    out = 0.0
    for dy in range(3):
        for dx in range(3):
            out = out + v[..., dy:dy + H, dx:dx + W]
    return out


def _zpad2(v, pad):
    """Zero-pad the last two dims by `pad` on each side via concatenation
    (Mosaic has no scatter; jnp.zeros+concat lowers cleanly)."""
    rows = jnp.zeros(v.shape[:-2] + (pad, v.shape[-1]), v.dtype)
    v = jnp.concatenate([rows, v, rows], axis=-2)
    cols = jnp.zeros(v.shape[:-1] + (pad,), v.dtype)
    return jnp.concatenate([cols, v, cols], axis=-1)


def _boxsum_full(g, H, W):
    """Transpose of valid boxsum: [*, H, W] -> [*, H+2, W+2] (zero pad)."""
    z = _zpad2(g, 2)
    out = 0.0
    for dy in range(3):
        for dx in range(3):
            out = out + z[..., dy:dy + H + 2, dx:dx + W + 2]
    return out


def _moments(xp, yp, H, W):
    inv9 = 1.0 / 9.0
    m1 = _boxsum_valid(xp, H, W) * inv9
    m2 = _boxsum_valid(yp, H, W) * inv9
    m3 = _boxsum_valid(xp * xp, H, W) * inv9
    m4 = _boxsum_valid(yp * yp, H, W) * inv9
    m5 = _boxsum_valid(xp * yp, H, W) * inv9
    return m1, m2, m3, m4, m5


def _ssim_terms(m1, m2, m3, m4, m5, C1, C2):
    mu2 = m1 * m1 + m2 * m2
    sxy2 = 2.0 * (m5 - m1 * m2) + C2
    n1 = 2.0 * m1 * m2 + C1
    d1 = mu2 + C1
    d2 = (m3 - m1 * m1) + (m4 - m2 * m2) + C2
    N = n1 * sxy2
    D = d1 * d2
    return N, D, n1, sxy2, d1, d2


def _fwd_kernel(xp_ref, yp_ref, out_ref, *, H, W, alpha, C1, C2):
    xp = xp_ref[0]
    yp = yp_ref[0]
    m1, m2, m3, m4, m5 = _moments(xp, yp, H, W)
    N, D, _, _, _, _ = _ssim_terms(m1, m2, m3, m4, m5, C1, C2)
    ssim = N / D
    ssim_term = jnp.clip((1.0 - ssim) * 0.5, 0.0, 1.0)
    x_c = xp[:, 1:1 + H, 1:1 + W]
    y_c = yp[:, 1:1 + H, 1:1 + W]
    l1 = jnp.abs(x_c - y_c)
    photo = (alpha * ssim_term + (1.0 - alpha) * l1).mean(axis=0)
    out_ref[0] = photo


def _bwd_kernel(xp_ref, yp_ref, g_ref, dx_ref, dy_ref, *, H, W, alpha,
                C1, C2):
    xp = xp_ref[0]
    yp = yp_ref[0]
    g = g_ref[0]  # [H, W] upstream gradient of the channel-meaned map
    m1, m2, m3, m4, m5 = _moments(xp, yp, H, W)
    N, D, n1, sxy2, d1, d2 = _ssim_terms(m1, m2, m3, m4, m5, C1, C2)
    ssim = N / D
    inside = ((1.0 - ssim) * 0.5 > 0.0) & ((1.0 - ssim) * 0.5 < 1.0)
    # d photo/d ssim = alpha/3 * (-1/2) on the clamp's linear region
    Gc = jnp.where(inside, g * (-0.5 * alpha / 3.0), 0.0)

    inv_D = 1.0 / D
    NDD = N * inv_D * inv_D
    # dS/dm1 = [dN/dm1 * D - N * dD/dm1] / D^2
    dN_dm1 = 2.0 * m2 * sxy2 - 2.0 * m2 * n1
    dD_dm1 = 2.0 * m1 * d2 - 2.0 * m1 * d1
    S1 = dN_dm1 * inv_D - NDD * dD_dm1
    dN_dm2 = 2.0 * m1 * sxy2 - 2.0 * m1 * n1
    dD_dm2 = 2.0 * m2 * d2 - 2.0 * m2 * d1
    S2 = dN_dm2 * inv_D - NDD * dD_dm2
    S3 = -NDD * d1          # dD/dm3 = d1
    S5 = 2.0 * n1 * inv_D   # dN/dm5 = 2 n1

    # y-side raw-moment partials: dS/dm4 == dS/dm3 (both enter through d2)
    inv9 = 1.0 / 9.0
    b_S1 = _boxsum_full(Gc * S1, H, W) * inv9
    b_S2 = _boxsum_full(Gc * S2, H, W) * inv9
    b_S3 = _boxsum_full(Gc * S3, H, W) * inv9
    b_S5 = _boxsum_full(Gc * S5, H, W) * inv9

    # m3 = E[x^2]: d m3/dx(q) = 2 x(q)/9; m5 = E[xy]: d m5/dx(q) = y(q)/9
    dx = b_S1 + 2.0 * xp * b_S3 + yp * b_S5
    dy = b_S2 + 2.0 * yp * b_S3 + xp * b_S5

    # L1 term on the interior pixels (zero-padded back to the padded grid)
    x_c = xp[:, 1:1 + H, 1:1 + W]
    y_c = yp[:, 1:1 + H, 1:1 + W]
    sgn = jnp.sign(x_c - y_c) * (g * (1.0 - alpha) / 3.0)
    sgn_p = _zpad2(sgn, 1)
    dx = dx + sgn_p
    dy = dy - sgn_p

    dx_ref[0] = dx
    dy_ref[0] = dy


def _call_fwd(xp, yp, alpha, C1, C2):
    B, C, Hp, Wp = xp.shape
    H, W = Hp - 2, Wp - 2
    kernel = functools.partial(_fwd_kernel, H=H, W=W, alpha=alpha,
                               C1=C1, C2=C2)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, C, Hp, Wp), lambda b: (b, 0, 0, 0)),
                  pl.BlockSpec((1, C, Hp, Wp), lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W), xp.dtype),
        interpret=_interpret(),
    )(xp, yp)


def _call_bwd(xp, yp, g, alpha, C1, C2):
    B, C, Hp, Wp = xp.shape
    H, W = Hp - 2, Wp - 2
    kernel = functools.partial(_bwd_kernel, H=H, W=W, alpha=alpha,
                               C1=C1, C2=C2)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, C, Hp, Wp), lambda b: (b, 0, 0, 0)),
                  pl.BlockSpec((1, C, Hp, Wp), lambda b: (b, 0, 0, 0)),
                  pl.BlockSpec((1, H, W), lambda b: (b, 0, 0))],
        out_specs=[pl.BlockSpec((1, C, Hp, Wp), lambda b: (b, 0, 0, 0)),
                   pl.BlockSpec((1, C, Hp, Wp), lambda b: (b, 0, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, C, Hp, Wp), xp.dtype),
                   jax.ShapeDtypeStruct((B, C, Hp, Wp), xp.dtype)],
        interpret=_interpret(),
    )(xp, yp, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _photo_padded(xp, yp, alpha, C1, C2):
    return _call_fwd(xp, yp, alpha, C1, C2)


def _photo_padded_fwd(xp, yp, alpha, C1, C2):
    return _call_fwd(xp, yp, alpha, C1, C2), (xp, yp)


def _photo_padded_bwd(alpha, C1, C2, res, g):
    xp, yp = res
    dx, dy = _call_bwd(xp, yp, g, alpha, C1, C2)
    return dx, dy


_photo_padded.defvjp(_photo_padded_fwd, _photo_padded_bwd)


def photometric_map_pallas(x, y, alpha=0.85, C1=1e-4, C2=9e-4):
    """Fused photometric map: x, y [B,H,W,3] -> [B,H,W,1]."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
    xp = xp.transpose(0, 3, 1, 2).astype(jnp.float32)
    yp = yp.transpose(0, 3, 1, 2).astype(jnp.float32)
    out = _photo_padded(xp, yp, float(alpha), float(C1), float(C2))
    return out[..., None]


def photometric_map_xla(x, y, alpha=0.85, C1=1e-4, C2=9e-4):
    """Reference XLA composition (the loss's default path)."""
    from packnet_sfm_tpu.ops.ssim import ssim_loss
    s = ssim_loss(x, y, C1, C2)
    l1 = jnp.abs(x - y)
    return (alpha * s.mean(axis=3, keepdims=True)
            + (1 - alpha) * l1.mean(axis=3, keepdims=True))
