"""
Image ops (NHWC), semantics-matched to the reference's torch calls.

All tensors are [B, H, W, C] (TPU-native layout; the reference uses NCHW).
Interpolation matches `torch.nn.functional.interpolate` conventions exactly
(reference call sites: packnet_sfm/utils/image.py:117-215), which is where
depth-estimation parity is usually won or lost.
"""

import functools
import os

import jax
import jax.numpy as jnp


########################################################################################################################
# Gradients / flips (reference: utils/image.py:43-113)

def gradient_x(image):
    """d/dx forward difference: [B,H,W,C] -> [B,H,W-1,C]."""
    return image[:, :, :-1, :] - image[:, :, 1:, :]


def gradient_y(image):
    """d/dy forward difference: [B,H,W,C] -> [B,H-1,W,C]."""
    return image[:, :-1, :, :] - image[:, 1:, :, :]


def flip_lr(image):
    """Horizontal flip of an NHWC image."""
    return image[:, :, ::-1, :]


########################################################################################################################
# Interpolation (torch-parity)

def _linear_weights(out_size, in_size, align_corners, dtype=jnp.float32):
    """Source coords for 1-D linear resize per torch conventions."""
    i = jnp.arange(out_size, dtype=dtype)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), dtype)
        else:
            src = i * (in_size - 1) / (out_size - 1)
    else:
        src = (i + 0.5) * in_size / out_size - 0.5
        src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    lo = jnp.clip(lo, 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w_hi = src - lo.astype(dtype)
    return lo, hi, w_hi


def interpolate(image, shape, mode='bilinear', align_corners=True):
    """
    Resize [B,H,W,C] to (H',W'), matching torch.nn.functional.interpolate.

    mode: 'bilinear' (align_corners True/False) or 'nearest'
    (torch 'nearest' = floor(i * in/out)).
    """
    H, W = int(shape[0]), int(shape[1])
    B, h, w, C = image.shape
    if (h, w) == (H, W):
        return image
    if mode == 'nearest':
        # Integer-ratio fast paths (the hot cases: 2^k pyramid scales, e.g.
        # upsample_depth_maps and mask match_scales). torch 'nearest' picks
        # src = floor(i * in/out); for out = r*in that is an exact r-fold
        # repeat, for in = r*out an exact stride-r subsample — both
        # expressible WITHOUT a gather. TPU gathers are index-bound
        # (~ms per million indices) and their autodiff transpose is a
        # scatter; broadcast/reshape and strided slices cost ~nothing and
        # transpose to cheap reductions/pads.
        if H % h == 0 and W % w == 0:
            ry, rx = H // h, W // w
            rep = jnp.broadcast_to(image[:, :, None, :, None, :],
                                   (B, h, ry, w, rx, C))
            return rep.reshape(B, H, W, C)
        if h % H == 0 and w % W == 0:
            return image[:, ::h // H, ::w // W]
        ys = jnp.floor(jnp.arange(H) * (h / H)).astype(jnp.int32)
        xs = jnp.floor(jnp.arange(W) * (w / W)).astype(jnp.int32)
        return image[:, ys][:, :, xs]
    if mode == 'bilinear':
        dtype = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32
        ylo, yhi, wy = _linear_weights(H, h, align_corners, dtype)
        xlo, xhi, wx = _linear_weights(W, w, align_corners, dtype)
        top = image[:, ylo]      # [B,H,w,C]
        bot = image[:, yhi]
        rows = top + (bot - top) * wy[None, :, None, None]
        left = rows[:, :, xlo]   # [B,H,W,C]
        right = rows[:, :, xhi]
        return left + (right - left) * wx[None, None, :, None]
    raise ValueError('Unknown interpolation mode {}'.format(mode))


def upsample2x_nearest(x):
    """Fast 2x nearest upsample [B,H,W,C] -> [B,2H,2W,C] (decoder hot path)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def match_scales(image, target_shapes, num_scales, mode='bilinear', align_corners=True):
    """
    Produce a list of `num_scales` resized copies of `image` matching the
    (H,W) of each target (reference: utils/image.py:181-215).
    `target_shapes` is a list of (H, W) tuples or arrays with .shape [B,H,W,C].
    """
    out = []
    for i in range(num_scales):
        t = target_shapes[i]
        hw = t if isinstance(t, tuple) else (t.shape[1], t.shape[2])
        out.append(interpolate(image, hw, mode=mode, align_corners=align_corners))
    return out


########################################################################################################################
# grid_sample (torch-parity: bilinear, align_corners=True, zeros padding)

def _grid_sample_xla(image, grid, padding_mode='zeros'):
    """Plain-XLA bilinear sampling (fully differentiable; the image-gradient
    path autodiffs to a scatter-add). Kept as the oracle and as the
    image-cotangent branch of the custom-VJP wrapper below."""
    B, H, W, C = image.shape
    gx, gy = grid[..., 0], grid[..., 1]
    # Unnormalize (align_corners=True): -1 -> 0, +1 -> size-1
    x = (gx + 1.0) * 0.5 * (W - 1)
    y = (gy + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # Same floor-fusion MISCOMPILE GUARD as _gs_patches below: this path is
    # live as the image-cotangent branch of the custom VJP (and as the CPU
    # oracle), so it needs the same pin on the shared floor() result.
    x0, y0 = jax.lax.optimization_barrier((x0, y0))
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = image.reshape(B, H * W, C)
        idx = yc * W + xc                        # [B,Ho,Wo]
        return jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1).reshape(idx.shape + (C,))

    if padding_mode == 'zeros':
        def valid(yi, xi):
            return ((yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
                    ).astype(image.dtype)[..., None]
        out = (gather(y0, x0) * valid(y0, x0) * (wy0 * wx0)[..., None] +
               gather(y0, x1) * valid(y0, x1) * (wy0 * wx1)[..., None] +
               gather(y1, x0) * valid(y1, x0) * (wy1 * wx0)[..., None] +
               gather(y1, x1) * valid(y1, x1) * (wy1 * wx1)[..., None])
    elif padding_mode == 'border':
        out = (gather(y0, x0) * (wy0 * wx0)[..., None] +
               gather(y0, x1) * (wy0 * wx1)[..., None] +
               gather(y1, x0) * (wy1 * wx0)[..., None] +
               gather(y1, x1) * (wy1 * wx1)[..., None])
    else:
        raise ValueError('Unknown padding mode {}'.format(padding_mode))
    return out


def _gs_patches(image, grid, padding_mode):
    """Gather the 4 bilinear taps with ONE gather. Returns
    (p00, p01, p10, p11, wx, wy) with out-of-bounds taps already zeroed in
    'zeros' mode, so both the value and the coordinate gradient are pure
    elementwise math over these.

    TPU: gather cost here is INDEX-bound, not byte-bound (measured: a
    [B,HW] gather of 12-wide slices costs the same ~10 ms as 3-wide at
    192x640 bs8). Packing the 4 taps as edge-shifted channel copies
    [B,H,W,4C] and gathering once at (y0,x0) therefore cuts the warp's
    gather time 4x vs four separate taps."""
    B, H, W, C = image.shape
    gx, gy = grid[..., 0], grid[..., 1]
    x = (gx + 1.0) * 0.5 * (W - 1)
    y = (gy + 1.0) * 0.5 * (H - 1)
    if padding_mode == 'border':
        # clamp coordinates first (torch border semantics); identical output
        # to per-tap clamping because wx/wy hit 0/1 at the borders
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # MISCOMPILE GUARD (round 3): XLA:TPU fuses floor into both the index
    # computation and the fraction below and gets wx wrong at ~40% of
    # pixels (== 0.5 exactly; deterministic at B8 192x640 — repro:
    # scripts/repro_xla_gather_miscompile.py). Barriering (x0, y0) keeps
    # one floor result feeding both consumers; measured fix with zero
    # wrong pixels and no step-time cost.
    x0, y0 = jax.lax.optimization_barrier((x0, y0))
    wx = x - x0
    wy = y - y0

    # 2-pixel pad (zeros: constant 0 / border: edge) + clamped indices makes
    # every out-of-bounds case exact with NO per-tap validity masks: any tap
    # whose true position is outside lands in the dead border, and clamping
    # far-OOB indices keeps BOTH taps of the (x0, x0+1) pair in it.
    pad_mode = 'constant' if padding_mode == 'zeros' else 'edge'
    P = jnp.pad(image, ((0, 0), (2, 2), (2, 2), (0, 0)), mode=pad_mode)
    Hp, Wp = H + 4, W + 4
    right = jnp.concatenate([P[:, :, 1:], P[:, :, -1:]], axis=2)
    down = jnp.concatenate([P[:, 1:], P[:, -1:]], axis=1)
    down_right = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    packed = jnp.concatenate([P, right, down, down_right], axis=-1)

    yc = jnp.clip(y0 + 2.0, 0, Hp - 2).astype(jnp.int32)
    xc = jnp.clip(x0 + 2.0, 0, Wp - 2).astype(jnp.int32)
    idx = (yc * Wp + xc).reshape(B, -1, 1)
    flat = packed.reshape(B, Hp * Wp, 4 * C)
    # MISCOMPILE GUARD 2 (round 3): XLA:TPU's lowering of this gather reads
    # garbage in the LAST channel of the LAST output row when the operand
    # ends exactly at the gather's reach (p11 wrong at ~109 last-row pixels
    # at B8 192x640; repro script). One dummy trailing row on the flattened
    # operand moves the buffer end out of reach; measured exact after.
    flat = jnp.pad(flat, ((0, 0), (0, 1), (0, 0)))
    taps = jnp.take_along_axis(flat, idx, axis=1
    ).reshape(B, grid.shape[1], grid.shape[2], 4, C)
    return (taps[..., 0, :], taps[..., 1, :], taps[..., 2, :],
            taps[..., 3, :], wx, wy)


def _gs_combine(p00, p01, p10, p11, wx, wy):
    wx = wx[..., None]
    wy = wy[..., None]
    top = p00 + (p01 - p00) * wx
    bot = p10 + (p11 - p10) * wx
    return top + (bot - top) * wy


def _gs_derivs(p00, p01, p10, p11, wx, wy):
    """Cotangent-independent derivative maps of bilinear sampling:
    d out/d x = A, d out/d y = B (unnormalized pixel coords). Saved as the
    custom-VJP residuals so the backward is pure elementwise math — no
    gathers, no kernel re-run — for BOTH warp backends."""
    wxe = wx[..., None]
    wye = wy[..., None]
    A = (p01 - p00) * (1.0 - wye) + (p11 - p10) * wye
    Bv = (p10 - p00) * (1.0 - wxe) + (p11 - p01) * wxe
    return A, Bv


# Warp backend switch: 'auto' (default on TPU) routes eligible shapes
# through the Pallas matmul-gather kernel (ops/pallas/warp.py); 'xla' is
# the packed-tap gather with the two TPU miscompile guards (_gs_patches).
#
# Round-3 history: the first 'auto' integration returned the six TAP
# tensors across the violation lax.cond and LOST end-to-end (145.8 vs
# ~125 ms/step selfsup) despite a 3x isolated win — the cond boundary
# materialized ~500 MB/step of fp32 taps and blocked XLA from fusing taps
# into the photometric chain. The current structure computes the combined
# warped image AND the two analytic derivative maps inside each cond branch
# (three [B,Ho,Wo,C] tensors cross, not six), saves (image, grid, A, B) as
# residuals, and the backward is pure elementwise math over A/B — the
# kernel is never re-run.
#
# Round-4 on-chip A/B (full selfsup_kitti train step, live tunnel,
# BENCH_NOTES round 4): the in-cond rebuild WINS in-step — 62.55 vs
# 60.68 img/s/chip (+3.1%) — so 'auto' (Pallas kernel with in-graph XLA
# fallback on band violation) is now the default on TPU backends.
# Eligibility is platform-gated (warp_pallas_supported): CPU/GPU and
# non-eligible shapes run the XLA path unchanged. PACKNET_WARP_IMPL=xla
# restores the pure-XLA backend.
# 'force' (timing-only: skips the band-violation fallback, can produce
# WRONG warps on violating grids) is deliberately bench-only — refuse it
# unless the caller owns the risk via PACKNET_WARP_FORCE_OK=1.
_WARP_IMPLS = ('auto', 'xla', 'force')
WARP_IMPL = os.environ.get('PACKNET_WARP_IMPL', 'auto')
if WARP_IMPL not in _WARP_IMPLS:
    raise ValueError(
        'PACKNET_WARP_IMPL={!r} is not one of {} (typos silently behaving '
        'like auto caused mis-attributed benchmarks)'.format(
            WARP_IMPL, _WARP_IMPLS))
if WARP_IMPL == 'force' and os.environ.get('PACKNET_WARP_FORCE_OK') != '1':
    raise ValueError(
        "PACKNET_WARP_IMPL=force skips the band-violation fallback and can "
        "produce wrong warps — it is for isolated kernel timing only. Set "
        "PACKNET_WARP_FORCE_OK=1 to confirm a bench context.")


def _pallas_warp_eligible(image, grid):
    if WARP_IMPL == 'xla':
        return False
    from packnet_sfm_tpu.ops.pallas.warp import warp_pallas_supported
    return warp_pallas_supported(image, grid)


def _warp_kernel_dtype(image):
    """bf16 sources run the kernel's one-hot contraction single-pass on
    the MXU (still tap-exact); f32 sources need 6-pass HIGHEST."""
    return (jnp.bfloat16 if image.dtype == jnp.bfloat16 else jnp.float32)


def _warp_value_cond(image, grid, padding_mode):
    """(warped, A, B) via the Pallas kernel with in-cond XLA fallback;
    only the combined image and the two derivative maps cross the cond
    boundary (the round-3 tap-materialization regression is structural:
    six fp32 tap tensors per warp crossing the cond cost more than the
    kernel saved)."""
    from packnet_sfm_tpu.ops.pallas.warp import (
        warp_plan, warp_taps_from_plan)
    plan, viol = warp_plan(image.shape, grid, padding_mode)
    odt = image.dtype

    def _finish(p00, p01, p10, p11, wx, wy):
        out = _gs_combine(p00, p01, p10, p11, wx, wy)
        A, Bv = _gs_derivs(p00, p01, p10, p11, wx, wy)
        return out.astype(odt), A.astype(odt), Bv.astype(odt)

    def xla_branch():
        return _finish(*_gs_patches(image, grid, padding_mode))

    def pallas_branch():
        taps = warp_taps_from_plan(image, plan, padding_mode,
                                   dtype=_warp_kernel_dtype(image))
        return _finish(*taps, plan['wx'], plan['wy'])

    if WARP_IMPL == 'force':  # timing-only: skip the violation fallback
        return pallas_branch()
    return jax.lax.cond(viol, xla_branch, pallas_branch)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample(image, grid, padding_mode='zeros'):
    """
    Bilinear sampling of [B,H,W,C] at normalized coords grid [B,Ho,Wo,2]
    (x, y in [-1, 1]), matching torch.nn.functional.grid_sample(
    mode='bilinear', align_corners=True) (reference call:
    geometry/camera_utils.py:56-58). Out-of-bounds samples contribute zeros
    ('zeros') or clamp to the border ('border').

    TPU note: gathers are the slowest primitive in the whole photometric
    path (the XLA packed-tap gather runs index-bound at ~7 ns/index in-step
    — 7.1 ms per full-res warp at B8 192x640 — and the naive autodiff
    re-gathers for the coordinate gradient and SCATTERS for the image
    gradient). Eligible TPU shapes route to the Pallas matmul-gather kernel
    (ops/pallas/warp.py); BOTH backends combine the taps in the forward and
    save (image, grid) plus the two analytic derivative maps (A, B) as
    residuals, so the backward's coordinate cotangent is pure elementwise
    math — zero gathers, zero scatters, no kernel re-run. The image cotangent (rare: warped sources are data, not
    activations, in every loss here) falls back to autodiff of the
    plain-XLA formulation and is dead-code eliminated when unused.
    """
    return _gs_fwd(image, grid, padding_mode)[0]


def _gs_fwd(image, grid, padding_mode):
    if _pallas_warp_eligible(image, grid):
        out, A, Bv = _warp_value_cond(image, grid, padding_mode)
        return out, (image, grid, A, Bv)
    p00, p01, p10, p11, wx, wy = _gs_patches(image, grid, padding_mode)
    out = _gs_combine(p00, p01, p10, p11, wx, wy)
    A, Bv = _gs_derivs(p00, p01, p10, p11, wx, wy)
    return out.astype(image.dtype), (image, grid, A, Bv)


def _gs_bwd(padding_mode, res, g):
    image, grid, A, Bv = res
    B, H, W, C = image.shape
    g32 = g.astype(jnp.float32)
    dwx = jnp.sum(g32 * A.astype(jnp.float32), -1)
    dwy = jnp.sum(g32 * Bv.astype(jnp.float32), -1)
    dgx = dwx * (0.5 * (W - 1))
    dgy = dwy * (0.5 * (H - 1))
    if padding_mode == 'border':
        # the forward clamps coordinates; its gradient is zero outside
        xu = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
        yu = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
        dgx = dgx * ((xu >= 0) & (xu <= W - 1)).astype(dgx.dtype)
        dgy = dgy * ((yu >= 0) & (yu <= H - 1)).astype(dgy.dtype)
    dgrid = jnp.stack([dgx, dgy], axis=-1).astype(grid.dtype)
    # image cotangent via the scatter-adding XLA path; DCE'd when unused
    out_xla, vjp = jax.vjp(
        lambda im: _grid_sample_xla(im, grid, padding_mode), image)
    dimage, = vjp(g.astype(out_xla.dtype))
    return dimage.astype(image.dtype), dgrid


grid_sample.defvjp(_gs_fwd, _gs_bwd)


########################################################################################################################
# Pooling / padding helpers

def reflect_pad_2d(x, pad=1):
    """Reflection padding on H and W of [B,H,W,C] (torch ReflectionPad2d)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode='reflect')


def avg_pool_3x3(x):
    """3x3 stride-1 valid average pool on [B,H,W,C] (SSIM inner op).

    Written as separable shifted-slice sums, NOT lax.reduce_window: on
    TPU reduce_window lowers ~17x off HBM bandwidth (0.53 ms per
    [8,768,640,3] pool; the selfsup step carried 28 ms of them — round-5
    device profile). Slices+adds fuse into one elementwise pass, and the
    backward (pads+adds) fuses the same way, replacing select_and_scatter.
    """
    h = x[:, :-2] + x[:, 1:-1] + x[:, 2:]
    s = h[:, :, :-2] + h[:, :, 1:-1] + h[:, :, 2:]
    return s / 9.0
