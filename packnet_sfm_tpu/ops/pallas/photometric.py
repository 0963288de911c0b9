"""
Fused photometric-map Pallas kernel (SSIM + L1) with analytic custom VJP.

Motivation (measured, single v5e chip): the self-supervised step runs ~6x
slower per image than the supervised-only step (408 vs 2461 img/s at
192x640) and the photometric-loss section is memory-bound — the XLA
composition of SSIM makes ~15+ HBM round-trips per (scale, context) for
pads, five 3x3 box filters and elementwise chains
(reference math: losses/multiview_photometric_loss.py:16-55,218-247).

Forward (one VMEM pass per tile):

    photo(p) = alpha * mean_c clamp01((1 - SSIM_c(p)) / 2)
             + (1-alpha) * mean_c |x_c(p) - y_c(p)|

Backward, analytic, via the raw-moment decomposition (m1=E[x], m2=E[y],
m3=E[x^2], m4=E[y^2], m5=E[xy], each a 3x3 box mean):

    S = N/D,  N = (2 m1 m2 + C1)(2(m5 - m1 m2) + C2)
              D = (m1^2 + m2^2 + C1)(m3 - m1^2 + m4 - m2^2 + C2)

    dL/dxp(q) = 1/9 [ bsum(G dS/dm1)(q) + 2 xp(q) bsum(G dS/dm3)(q)
                      + yp(q) bsum(G dS/dm5)(q) ] + L1 term,

where bsum is the zero-padded transpose of the valid 3x3 box sum. The
reflect-pad fold is left to JAX autodiff (the custom-VJP boundary sits
AFTER jnp.pad), so the kernels only see zero-padding semantics.

VMEM strategy: whole images blow the 16MB scoped-VMEM budget at 192x640,
so the wrapper pre-slices OVERLAPPING row tiles in XLA (a cheap gather)
and the kernels consume non-overlapping [tile] blocks — halo handling
without Pallas-side DMA choreography. HBM traffic ~2 reads + 1 write vs
the XLA composition's ~15 passes.

Verified against the XLA composition and its autodiff in
tests/test_pallas_photometric.py (interpret mode on CPU, compiled on TPU).
Enable with cfg.tpu.use_pallas.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret():
    """Interpreter mode off-TPU (CPU tests run the kernels interpreted)."""
    return jax.default_backend() != 'tpu'


TILE_H = 48  # valid-grid rows per kernel invocation (fits 16MB scoped VMEM)


def _boxsum_valid(v, H, W):
    """Sum of 3x3 windows: [*, H+2, W+2] -> [*, H, W] (valid)."""
    out = 0.0
    for dy in range(3):
        for dx in range(3):
            out = out + v[..., dy:dy + H, dx:dx + W]
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
    sxy2 = 2.0 * (m5 - m1 * m2) + C2
    n1 = 2.0 * m1 * m2 + C1
    d1 = m1 * m1 + m2 * m2 + C1
    d2 = (m3 - m1 * m1) + (m4 - m2 * m2) + C2
    return n1 * sxy2, d1 * d2, n1, sxy2, d1, d2


def _row_tiles(x, starts, rows):
    """Gather overlapping row tiles: [B,C,Hp,Wp] -> [B,T,C,rows,Wp]."""
    idx = starts[:, None] + jnp.arange(rows)[None, :]      # [T, rows]
    idx = jnp.clip(idx, 0, x.shape[2] - 1)
    out = x[:, :, idx, :]                                   # [B,C,T,rows,Wp]
    return out.transpose(0, 2, 1, 3, 4)


########################################################################################################################
# Forward


def _fwd_kernel(xp_ref, yp_ref, out_ref, *, TH, W, alpha, C1, C2):
    xp = xp_ref[0, 0]           # [C, TH+2, W+2]
    yp = yp_ref[0, 0]
    m1, m2, m3, m4, m5 = _moments(xp, yp, TH, W)
    N, D, _, _, _, _ = _ssim_terms(m1, m2, m3, m4, m5, C1, C2)
    ssim_term = jnp.clip((1.0 - N / D) * 0.5, 0.0, 1.0)
    l1 = jnp.abs(xp[:, 1:1 + TH, 1:1 + W] - yp[:, 1:1 + TH, 1:1 + W])
    out_ref[0, 0] = (alpha * ssim_term + (1.0 - alpha) * l1).mean(axis=0)


def _call_fwd(xp, yp, alpha, C1, C2):
    B, C, Hp, Wp = xp.shape
    H, W = Hp - 2, Wp - 2
    TH = min(TILE_H, H)
    n_t = -(-H // TH)
    Hpad = n_t * TH
    starts = jnp.arange(n_t) * TH
    xt = _row_tiles(xp, starts, TH + 2)     # [B,T,C,TH+2,Wp]
    yt = _row_tiles(yp, starts, TH + 2)
    kernel = functools.partial(_fwd_kernel, TH=TH, W=W, alpha=alpha,
                               C1=C1, C2=C2)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[pl.BlockSpec((1, 1, C, TH + 2, Wp),
                               lambda b, t: (b, t, 0, 0, 0)),
                  pl.BlockSpec((1, 1, C, TH + 2, Wp),
                               lambda b, t: (b, t, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, TH, W), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_t, TH, W), xp.dtype),
        interpret=_interpret(),
    )(xt, yt)
    return out.reshape(B, Hpad, W)[:, :H]


########################################################################################################################
# Backward


def _bwd_kernel(xw_ref, yw_ref, g_ref, dx_ref, dy_ref, *, TQ, W, alpha,
                C1, C2):
    """
    Width-constant formulation: Mosaic supports lane slicing but not lane
    concatenation/expansion, so ALL zero-padding is done XLA-side and the
    kernel only ever narrows widths.

    Coordinates (columns): xw has width W+6 with xp (width Wp=W+2) at cols
    [2, W+4); g has width W+4 with the valid-grid gradient (width W) at cols
    [2, W+2). Wide moments at index j correspond to valid column p = j-2
    (junk outside [0,W) is nulled by g's zeros). Rows: the tile covers
    padded rows q in [q0, q0+TQ); xw rows are [q0-2, q0+TQ+2), g rows
    [q0-2, q0+TQ) with zero rows outside the valid range.
    """
    xw = xw_ref[0, 0]           # [C, TQ+4, W+6]
    yw = yw_ref[0, 0]
    g = g_ref[0, 0]             # [TQ+2, W+4]
    TP = TQ + 2                 # covered p rows
    WW = W + 4                  # wide moment width
    m1, m2, m3, m4, m5 = _moments(xw, yw, TP, WW)
    N, D, n1, sxy2, d1, d2 = _ssim_terms(m1, m2, m3, m4, m5, C1, C2)
    ssim = N / D
    lin = (1.0 - ssim) * 0.5
    inside = (lin > 0.0) & (lin < 1.0)
    Gc = jnp.where(inside, g * (-0.5 * alpha / 3.0), 0.0)

    inv_D = 1.0 / D
    NDD = N * inv_D * inv_D
    S1 = (2.0 * m2 * (sxy2 - n1)) * inv_D - NDD * (2.0 * m1 * (d2 - d1))
    S2 = (2.0 * m1 * (sxy2 - n1)) * inv_D - NDD * (2.0 * m2 * (d2 - d1))
    S3 = -NDD * d1
    S5 = 2.0 * n1 * inv_D

    inv9 = 1.0 / 9.0
    Wp = W + 2

    def bsum_q(v):
        """[C,TP,W+4] wide p-grid -> [C,TQ,Wp] q-grid (pure slicing):
        dx(q) sums p in [q-2, q]; wide col j = p+2 -> cols [q, q+2];
        rows: p = q0-2+i, q = q0+j -> i in [j, j+2]."""
        out = 0.0
        for dy in range(3):
            for dxs in range(3):
                out = out + v[..., dy:dy + TQ, dxs:dxs + Wp]
        return out

    b_S1 = bsum_q(Gc * S1) * inv9
    b_S2 = bsum_q(Gc * S2) * inv9
    b_S3 = bsum_q(Gc * S3) * inv9
    b_S5 = bsum_q(Gc * S5) * inv9

    xq = xw[:, 2:2 + TQ, 2:2 + Wp]   # xp values at padded rows [q0, q0+TQ)
    yq = yw[:, 2:2 + TQ, 2:2 + Wp]
    dx = b_S1 + 2.0 * xq * b_S3 + yq * b_S5
    dy = b_S2 + 2.0 * yq * b_S3 + xq * b_S5

    # L1 term: dL/dxp(q) += sign(xp(q)-yp(q)) * g(p=q-1) * (1-alpha)/3;
    # boundary rows/cols get 0 from g's zero padding.
    g_c = g[1:1 + TQ, 1:1 + Wp]      # g at p = q-1 (rows i=j+1, cols j=q+1)
    sgn = jnp.sign(xq - yq) * (g_c * (1.0 - alpha) / 3.0)
    dx = dx + sgn
    dy = dy - sgn

    dx_ref[0, 0] = dx
    dy_ref[0, 0] = dy


def _call_bwd(xp, yp, g, alpha, C1, C2):
    B, C, Hp, Wp = xp.shape
    H, W = Hp - 2, Wp - 2
    TQ = min(TILE_H, Hp)
    n_t = -(-Hp // TQ)
    starts = jnp.arange(n_t) * TQ

    # Widen columns XLA-side (Mosaic kernels only narrow widths):
    xw = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (2, 2)))   # [B,C,Hp,W+6]
    yw = jnp.pad(yp, ((0, 0), (0, 0), (0, 0), (2, 2)))
    gw = jnp.pad(g, ((0, 0), (0, 0), (2, 2)))            # [B,H,W+4]

    # xw tiles: rows [q0-2, q0+TQ+2), edge rows clamped; clamped duplicates
    # only feed moments at p outside the valid range, where g is zero.
    xt = _row_tiles(xw, starts - 2, TQ + 4)
    yt = _row_tiles(yw, starts - 2, TQ + 4)
    # g tiles on the p grid, rows [q0-2, q0+TQ) with zero rows outside
    gz = jnp.concatenate([jnp.zeros((B, 2, W + 4), g.dtype), gw,
                          jnp.zeros((B, 2 + TQ, W + 4), g.dtype)], axis=1)
    gidx = (starts[:, None] + jnp.arange(TQ + 2)[None, :])
    gt = gz[:, gidx, :]                     # [B, n_t, TQ+2, W+4]

    kernel = functools.partial(_bwd_kernel, TQ=TQ, W=W, alpha=alpha,
                               C1=C1, C2=C2)
    dxt, dyt = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[pl.BlockSpec((1, 1, C, TQ + 4, W + 6),
                               lambda b, t: (b, t, 0, 0, 0)),
                  pl.BlockSpec((1, 1, C, TQ + 4, W + 6),
                               lambda b, t: (b, t, 0, 0, 0)),
                  pl.BlockSpec((1, 1, TQ + 2, W + 4),
                               lambda b, t: (b, t, 0, 0))],
        out_specs=[pl.BlockSpec((1, 1, C, TQ, Wp),
                                lambda b, t: (b, t, 0, 0, 0)),
                   pl.BlockSpec((1, 1, C, TQ, Wp),
                                lambda b, t: (b, t, 0, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, n_t, C, TQ, Wp), xp.dtype),
                   jax.ShapeDtypeStruct((B, n_t, C, TQ, Wp), xp.dtype)],
        interpret=_interpret(),
    )(xt, yt, gt)
    dx = dxt.transpose(0, 2, 1, 3, 4).reshape(B, C, n_t * TQ, Wp)[:, :, :Hp]
    dy = dyt.transpose(0, 2, 1, 3, 4).reshape(B, C, n_t * TQ, Wp)[:, :, :Hp]
    return dx, dy


########################################################################################################################
# custom_vjp + public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _photo_padded(xp, yp, alpha, C1, C2):
    return _call_fwd(xp, yp, alpha, C1, C2)


def _photo_padded_fwd(xp, yp, alpha, C1, C2):
    return _call_fwd(xp, yp, alpha, C1, C2), (xp, yp)


def _photo_padded_bwd(alpha, C1, C2, res, g):
    xp, yp = res
    return _call_bwd(xp, yp, g, alpha, C1, C2)


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
