"""
Pallas TPU kernel: generic-camera patch-softmax projection
(reference: geometry/camera_generic.py:159-208 — the softmax match of each
target ray direction against a (2p+1)^2 patch of the reference ray surface;
p=20 -> K=1681 candidates per pixel).

Why a kernel: the XLA formulations must materialize per-pixel patch data in
HBM — the dense path a [B, HW, K, 3] gather (620 MB/image at half-res,
which is why the reference pins this model to half resolution) and the
streaming-scan path k1=2p+1 rounds of [B, HW, k1, 3] gathers re-reading
each ray ~K times. The window structure is a stencil: this kernel keeps the
WHOLE ray plane of one image in VMEM (H*W*3 fp32 = 1.5 MB at full 192x640
-> trivially fits), so every candidate read is on-chip and HBM traffic
drops by ~K (1681x).

Per-pixel shifted windows (the reference shifts patches in-bounds rather
than clamping) decompose into VPU-friendly ops:
- window START per axis is clip(c - p, 0, size - k1): constant 0 for the
  first p pixels, c - p in the interior, size - k1 for the last p. So for a
  fixed window offset j the column gather is a static ROLL of the ray row
  plus two broadcast fixes for the left/right border columns.
- row starts are handled the same way with TH dynamic row slices per
  window-row offset i.

Softmax over the K candidates runs ONLINE (flash-attention recurrence):
carry running max m, normalizer s, and coordinate numerators (ey, ex) over
the k1 window-row iterations, rescaling by exp(m - m_new). Output is the
expected (row, col) patch coordinate — exactly the dense softmax result.

Backward: custom VJP with an ANALYTIC Pallas backward kernel. The softmax-
expectation gradient is local given the forward's (ey, ex, m, s) — which the
forward kernel emits as cheap extra outputs — so the backward replays the
window sweep once: glogit_k = p_k * (gy*(row_k - ey) + gx*(col_k - ex)),
d-gradient accumulates in registers, and the ray-plane gradient scatters by
INVERTING the forward's roll/border-fix column gathers (interior columns:
inverse roll; border columns: masked row-sums into the fixed column) and
accumulating into a VMEM-resident [3,H,W] gradient plane across row tiles.
This makes full-resolution generic-camera TRAINING feasible — the XLA
streaming recompute backward costs seconds per call at 192x640 (see
BENCH_NOTES.md); the kernel pair keeps both directions on-chip.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_starts_np(n, p):
    """Shift-in-bounds window start per pixel (matches
    geometry/camera_generic.py _patch_coords; may go negative iff k1 > n)."""
    k1 = 2 * p + 1
    s = np.maximum(np.arange(n) - p, 0)
    return (s - np.maximum(s + k1 - n, 0)).astype(np.int32)


def _pick_row_tile(H):
    th = 8
    while H % th:
        th -= 1
    return th


def _gather_cols(slab, j, p, W, left, right):
    """slab[:, clip(x-p, 0, W-k1) + j] for all columns x, as
    roll + two broadcast border fixes (all static slices)."""
    k1 = 2 * p + 1
    shift = (p - j) % W
    # shift==0 (j==p) must bypass roll: its slice+concat decomposition emits
    # a zero-width slice, which Mosaic rejects (vector sizes must be > 0).
    rolled = slab if shift == 0 else jnp.roll(slab, shift, axis=1)
    fix_l = slab[:, j:j + 1]                      # x < p: start is 0
    fix_r = slab[:, W - k1 + j:W - k1 + j + 1]    # x > W-1-p: start is W-k1
    return jnp.where(left, fix_l, jnp.where(right, fix_r, rolled))


def _proj_kernel(ray_ref, d_ref, rows_ref, cols_ref, m_ref, s_ref, L_ref,
                 *, p, TH, H, W):
    """One program = one (batch b, row-tile t): TH output rows x W cols.

    ray_ref: [1, 3, H, W] full ray plane of image b (VMEM-resident)
    d_ref:   [1, 3, TH, W] unit directions pre-divided by the temperature
    rows/cols_ref: [1, TH, W] expected patch coordinates
    m/s_ref: [1, TH, W] final softmax running max / normalizer (bwd residuals)
    L_ref: [k1, TH, W] scratch for one window-row of logits
    """
    k1 = 2 * p + 1
    t = pl.program_id(1)
    y0 = t * TH

    d0, d1, d2 = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
    col = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)
    tyi = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 0)
    colbase = jnp.clip(col - p, 0, W - k1).astype(jnp.float32)
    left = col < p
    right = col > W - 1 - p
    sy2d = jnp.clip(y0 + tyi - p, 0, H - k1)      # window start row [TH,W]

    def i_body(i, carry):
        m, s, ey, ex = carry
        # ray slab for window-row offset i: row tt reads ray row
        # clip(y0+tt-p, 0, H-k1) + i  (TH dynamic row slices per channel)
        slabs = []
        for c in range(3):
            rows = []
            for tt in range(TH):
                r = jnp.clip(y0 + tt - p, 0, H - k1) + i
                rows.append(ray_ref[0, c, pl.ds(r, 1), :])
            slabs.append(jnp.concatenate(rows, axis=0))
        s0, s1, s2 = slabs

        mi = jnp.full((TH, W), -1e30, jnp.float32)
        for j in range(k1):
            g0 = _gather_cols(s0, j, p, W, left, right)
            g1 = _gather_cols(s1, j, p, W, left, right)
            g2 = _gather_cols(s2, j, p, W, left, right)
            logit = d0 * g0 + d1 * g1 + d2 * g2
            L_ref[j] = logit
            mi = jnp.maximum(mi, logit)

        m_new = jnp.maximum(m, mi)
        alpha = jnp.exp(m - m_new)
        s, ey, ex = s * alpha, ey * alpha, ex * alpha
        rowc = (sy2d + i).astype(jnp.float32)
        for j in range(k1):
            pexp = jnp.exp(L_ref[j] - m_new)
            s = s + pexp
            ey = ey + rowc * pexp
            ex = ex + (colbase + float(j)) * pexp
        return m_new, s, ey, ex

    zeros = jnp.zeros((TH, W), jnp.float32)
    init = (jnp.full((TH, W), -1e30, jnp.float32), zeros, zeros, zeros)
    m, s, ey, ex = jax.lax.fori_loop(0, k1, i_body, init)
    rows_ref[0] = ey / s
    cols_ref[0] = ex / s
    m_ref[0] = m
    s_ref[0] = s


def _expected_pallas_ms(ray_p, d_p, p, interpret=False):
    """ray_p, d_p: [B, 3, H, W] fp32 (d pre-divided by temperature).
    Returns (rows, cols, m, s): [B, H, W] expected patch coordinates plus
    the final softmax running max / normalizer (backward residuals)."""
    B, _, H, W = ray_p.shape
    k1 = 2 * p + 1
    assert H >= k1 and W >= k1, 'kernel needs k1 <= H, W ({} vs {}x{})'.format(
        k1, H, W)
    TH = _pick_row_tile(H)
    grid = (B, H // TH)
    kernel = functools.partial(_proj_kernel, p=p, TH=TH, H=H, W=W)
    out = jax.ShapeDtypeStruct((B, H, W), jnp.float32)
    tile_spec = pl.BlockSpec((1, TH, W), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM)
    rows, cols, m, s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, H, W), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TH, W), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_spec, tile_spec, tile_spec, tile_spec],
        out_shape=[out, out, out, out],
        scratch_shapes=[pltpu.VMEM((k1, TH, W), jnp.float32)],
        interpret=interpret,
    )(ray_p, d_p)
    return rows, cols, m, s


def _expected_pallas(ray_p, d_p, p, interpret=False):
    """Forward only: (rows, cols) [B, H, W] expected patch coordinates."""
    rows, cols, _, _ = _expected_pallas_ms(ray_p, d_p, p, interpret)
    return rows, cols


def _scatter_cols(cc, j, p, W, left, right, col_is):
    """Adjoint of _gather_cols: scatter cc back into slab-column space.

    Interior columns invert the roll; the left/right border columns each
    accumulate a masked row-sum into their fixed slab column (j / W-k1+j)."""
    k1 = 2 * p + 1
    shift = (p - j) % W
    zero = jnp.zeros_like(cc)
    interior = jnp.where(jnp.logical_or(left, right), zero, cc)
    sg = interior if shift == 0 else jnp.roll(interior, -shift, axis=1)
    lsum = jnp.sum(jnp.where(left, cc, zero), axis=1, keepdims=True)
    rsum = jnp.sum(jnp.where(right, cc, zero), axis=1, keepdims=True)
    sg = sg + jnp.where(col_is == j, lsum, 0.0)
    sg = sg + jnp.where(col_is == W - k1 + j, rsum, 0.0)
    return sg


def _proj_bwd_kernel(ray_ref, d_ref, ey_ref, ex_ref, m_ref, s_ref,
                     gy_ref, gx_ref, dd_ref, dray_ref, *, p, TH, H, W):
    """Analytic backward: one program = one (batch b, row-tile t).

    Replays the forward window sweep with the saved (ey, ex, m, s):
      p_k      = exp(d . g_k - m) / s
      glogit_k = p_k * (gy * (row_k - ey) + gx * (col_k - ex))
      dd      += glogit_k * g_k                  (register accumulation)
      dray[window pos of k] += glogit_k * d      (inverse-roll scatter)
    dray_ref is the FULL [1, 3, H, W] gradient plane, revisited by every
    row tile of the batch image (index_map constant in t) — zeroed at t==0
    and accumulated sequentially (TPU grids are sequential by default).
    """
    k1 = 2 * p + 1
    t = pl.program_id(1)
    y0 = t * TH

    @pl.when(t == 0)
    def _zero():
        dray_ref[...] = jnp.zeros_like(dray_ref)

    d0, d1, d2 = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
    ey, ex = ey_ref[0], ex_ref[0]
    m, s = m_ref[0], s_ref[0]
    gy, gx = gy_ref[0], gx_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)
    tyi = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 0)
    colbase = jnp.clip(col - p, 0, W - k1).astype(jnp.float32)
    left = col < p
    right = col > W - 1 - p
    sy2d = jnp.clip(y0 + tyi - p, 0, H - k1)

    def i_body(i, carry):
        dd0, dd1, dd2 = carry
        slabs = []
        for c in range(3):
            rows = []
            for tt in range(TH):
                r = jnp.clip(y0 + tt - p, 0, H - k1) + i
                rows.append(ray_ref[0, c, pl.ds(r, 1), :])
            slabs.append(jnp.concatenate(rows, axis=0))
        s0, s1, s2 = slabs
        rowc = (sy2d + i).astype(jnp.float32)
        gy_row = gy * (rowc - ey)

        sg0 = jnp.zeros((TH, W), jnp.float32)
        sg1 = jnp.zeros((TH, W), jnp.float32)
        sg2 = jnp.zeros((TH, W), jnp.float32)
        for j in range(k1):
            g0 = _gather_cols(s0, j, p, W, left, right)
            g1 = _gather_cols(s1, j, p, W, left, right)
            g2 = _gather_cols(s2, j, p, W, left, right)
            logit = d0 * g0 + d1 * g1 + d2 * g2
            pk = jnp.exp(logit - m) / s
            gl = pk * (gy_row + gx * (colbase + float(j) - ex))
            dd0 = dd0 + gl * g0
            dd1 = dd1 + gl * g1
            dd2 = dd2 + gl * g2
            sg0 = sg0 + _scatter_cols(gl * d0, j, p, W, left, right, col)
            sg1 = sg1 + _scatter_cols(gl * d1, j, p, W, left, right, col)
            sg2 = sg2 + _scatter_cols(gl * d2, j, p, W, left, right, col)
        # scatter slab rows back into the gradient plane (read-modify-write;
        # border rows of neighbouring tt may alias the same ray row, so the
        # adds must stay sequential per channel)
        for c, sg in ((0, sg0), (1, sg1), (2, sg2)):
            for tt in range(TH):
                r = jnp.clip(y0 + tt - p, 0, H - k1) + i
                dray_ref[0, c, pl.ds(r, 1), :] = (
                    dray_ref[0, c, pl.ds(r, 1), :] + sg[tt:tt + 1, :])
        return dd0, dd1, dd2

    zeros = jnp.zeros((TH, W), jnp.float32)
    dd0, dd1, dd2 = jax.lax.fori_loop(0, k1, i_body, (zeros, zeros, zeros))
    dd_ref[0, 0] = dd0
    dd_ref[0, 1] = dd1
    dd_ref[0, 2] = dd2


def _proj_bwd_pallas(ray_p, d_p, ey, ex, m, s, gy, gx, p, interpret=False):
    """Pallas adjoint: returns (dray_p, dd_p), both [B, 3, H, W] fp32."""
    B, _, H, W = ray_p.shape
    TH = _pick_row_tile(H)
    grid = (B, H // TH)
    kernel = functools.partial(_proj_bwd_kernel, p=p, TH=TH, H=H, W=W)
    tile_spec = pl.BlockSpec((1, TH, W), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((1, 3, H, W), lambda b, t: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    dd, dray = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            plane_spec,
            pl.BlockSpec((1, 3, TH, W), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            tile_spec, tile_spec, tile_spec, tile_spec, tile_spec, tile_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 3, TH, W), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            plane_spec,
        ],
        out_shape=[jax.ShapeDtypeStruct((B, 3, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((B, 3, H, W), jnp.float32)],
        interpret=interpret,
    )(ray_p, d_p, ey, ex, m, s, gy, gx)
    return dray, dd


def _expected_xla(ray_p, d_p, p):
    """XLA twin of the kernel (streaming online softmax over window rows) —
    used for the backward pass and as the parity oracle."""
    from packnet_sfm_tpu.geometry.camera_generic import (
        _project_expected_streaming)
    B, _, H, W = ray_p.shape
    ray_flat = jnp.moveaxis(ray_p.reshape(B, 3, H * W), 1, 2)
    d_flat = jnp.moveaxis(d_p.reshape(B, 3, H * W), 1, 2)
    sy = jnp.asarray(np.repeat(_window_starts_np(H, p), W))
    sx = jnp.asarray(np.tile(_window_starts_np(W, p), H))
    rows, cols = _project_expected_streaming(
        ray_flat, d_flat, sy, sx, p, W, temperature=1.0)
    return rows.reshape(B, H, W), cols.reshape(B, H, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def expected_patch_coords(ray_p, d_p, p, interpret=False):
    """Differentiable expected patch (row, col): Pallas forward AND analytic
    Pallas backward (see _proj_bwd_kernel). Args as _expected_pallas."""
    return _expected_pallas(ray_p, d_p, p, interpret)


def _fwd(ray_p, d_p, p, interpret):
    rows, cols, m, s = _expected_pallas_ms(ray_p, d_p, p, interpret)
    return (rows, cols), (ray_p, d_p, rows, cols, m, s)


def _bwd(p, interpret, res, g):
    ray_p, d_p, rows, cols, m, s = res
    gy, gx = g
    return _proj_bwd_pallas(ray_p, d_p, rows, cols, m, s, gy, gx, p,
                            interpret)


expected_patch_coords.defvjp(_fwd, _bwd)


def pallas_projection_usable(H2, W2, patch_side):
    k1 = 2 * patch_side + 1
    return H2 >= k1 and W2 >= k1
