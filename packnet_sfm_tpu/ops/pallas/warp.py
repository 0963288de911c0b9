"""
VMEM-resident bilinear warp gather — the Pallas kernel under grid_sample.

Why: the self-supervised photometric path is dominated by the warp's
per-pixel gathers. XLA lowers them as HBM-latency-bound dynamic gathers
(~10 ns/index on v5e regardless of slice width — BENCH_NOTES round 2), and
the 2-context x 4-scale full-resolution warps of the KITTI workload
(reference: packnet_sfm/losses/multiview_photometric_loss.py:185-200 with
upsample_depth_maps=True) issue ~8M indices per training step = ~80 ms.

Formulation: gather-as-matmul. Mosaic's in-register dynamic_gather has a
measured ~2.8 us FIXED cost per op on v5e (scripts/bench_dynamic_gather.py)
— useless at this granularity — so instead the kernel selects pixels with a
ONE-HOT CONTRACTION on the MXU, which costs ~nothing at these shapes:

- the source image is pre-packed OUTSIDE the kernel as [B, Hp, 8, Wpad]:
  sublanes = [R,G,B, R>,G>,B>, 0,0] where X> is the one-pixel-right shift —
  the contraction then returns BOTH horizontal bilinear taps at once (the
  same edge-shift packing trick as the XLA packed-tap path, ops/image.py).
- per (batch, 8-row output tile) grid program, a TILE_BAND-row band of the
  packed source is DMA'd HBM->VMEM once.
- per output row, the row's BH-row sub-band of the tile's DMA'd band is
  viewed as [BH*8, Wpad] (band-row s x packed-channel k in sublanes); per
  128-lane output chunk, a one-hot [WIN=384, 128] built from the x-indices
  contracts with the [BH*8, WIN] window: G[s*8+k, px] = src[band s, ch k,
  x(px)]. One MXU op replaces 128 gathers.
- the vertical taps fall out by selecting sublane groups: top tap where
  s == ylocal(px), bottom where s == ylocal(px)+1 — BH cheap vector selects.

BH is sized for REAL SfM flows: vertical displacement varies with depth
across an output row (dy = f*ty/Z + rotation), so per-row y-spans of 14-22
rows are routine (measured on the selfsup workload, round 3) — BH=24
covers them. Out-of-band geometry (row y-span > BH-2, tile tilt >
TILE_BAND-BH, |dx| outside the 3-chunk window) sets a scalar violation
flag OUTSIDE the kernel and the caller lax.cond-falls back to the XLA
packed-tap path, so semantics stay exact for arbitrary flows. Out-of-IMAGE
samples are exact by construction: coordinates are clamped into a 2-pixel
dead border (zeros / edge padding) before the kernel, identical to the
XLA path.

The kernel returns the four bilinear taps (packed); the caller combines
them INSIDE the violation cond and saves only the analytic derivative maps
(ops/image.py _gs_derivs) as VJP residuals, so (a) only image-sized
tensors cross the cond boundary and (b) the backward pass is pure
elementwise math — no gathers, no second kernel run.

Precision: `dtype=bfloat16` runs the contraction single-pass on the MXU
and is still tap-EXACT for bf16 sources (a one-hot contraction with f32
accumulation selects bf16 values bit-exactly) — the bf16 photometric path
feeds bf16 refs (losses/photometric.py). `float32` needs 6-pass HIGHEST.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test hook: force interpret-mode kernels (CPU parity tests of the
# grid_sample dispatch path set this; see tests/test_pallas_warp.py).
INTERPRET = False

TILE_ROWS = 8     # output rows per grid program
# Per-output-row source band. Real SfM flows have vertical displacement
# varying with DEPTH across one output row (dy = f*ty/Z + rotation): the
# measured y-span on the selfsup workload is 14-22 rows (round 3 probe).
# BH=24 (covers spans <= 22) had ZERO margin on that workload: the span
# sat exactly at the limit on CPU, and the TPU's bf16 pose forward nudged
# one context's grid to span 23 — the violation cond then silently took
# the 35 ms XLA fallback every step while the isolated kernel A/B showed
# 8.5x (round-5 device profile, BENCH_NOTES). BH=32 gives an 8-row margin
# at ~1 ms extra kernel time; wider flows still fall back exactly.
BH = 32
TILE_BAND = 64    # DMA'd band per tile (BH + inter-row tilt <= TILE_BAND-BH)
LANE = 128
# Per-chunk source window (displacement band |dx| <~ 128 at the default 3
# chunks). The one-hot contraction's FLOPs scale linearly with WIN, so the
# chip bench can A/B a tighter 2-chunk band (PACKNET_WARP_WIN=256) — the
# violation flag falls back to the XLA path when a flow leaves it, so
# semantics are WIN-invariant.
WIN = int(os.environ.get('PACKNET_WARP_WIN', 3 * LANE))
assert WIN % LANE == 0 and WIN >= 2 * LANE, 'WIN must be a multiple of 128 >= 256'


def _cdiv(a, b):
    return -(-a // b)


def _warp_kernel(n_chunks, wpad, dtype, fuse_out, base_t_ref, rowoff_ref,
                 src_ref, xloc_ref, ylocal_ref,
                 *out_refs_and_scratch):
    if fuse_out:
        # bf16 mode: ONE output ref [1, TILE_ROWS, 16, wo_pad] holding
        # top(8)+bot(8) sublanes — a [16, LANE] bf16 store is exactly one
        # (16, 128) bf16 tile, so every write is tile-aligned AND the
        # output traffic halves vs two f32 refs (taps of a bf16 source are
        # bf16-exact, so nothing is lost casting them back).
        out_ref, band, sem = out_refs_and_scratch
        top_ref = bot_ref = None
    else:
        top_ref, bot_ref, band, sem = out_refs_and_scratch
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    base = base_t_ref[b * n_t + t]
    dma = pltpu.make_async_copy(
        src_ref.at[b, pl.ds(base, TILE_BAND)], band, sem)
    dma.start()
    dma.wait()
    iota_win = jax.lax.broadcasted_iota(jnp.int32, (WIN, LANE), 0)
    for i in range(TILE_ROWS):
        off = rowoff_ref[b * (n_t * TILE_ROWS) + t * TILE_ROWS + i]
        # this row's BH-row sub-band as [BH*8 = s*8+ch sublanes, wpad]
        # (contiguous (s, ch, w) -> (s*8+ch, w) reshape of the band slice)
        win_full = band[pl.ds(off, BH)].reshape(BH * 8, wpad).astype(dtype)
        for c in range(n_chunks):
            lane0 = c * LANE
            wstart = min(max(0, (c - 1) * LANE), wpad - WIN)
            # per-chunk REF reads: value-slicing the full row gives offset
            # layouts Mosaic refuses to broadcast across sublanes
            xi = xloc_ref[0, i:i + 1, lane0:lane0 + LANE] - wstart  # [1,LANE]
            yi = ylocal_ref[0, i:i + 1, lane0:lane0 + LANE]
            # build the one-hot in f32 and cast: selecting in `dtype`
            # directly makes Mosaic relayout the i1 mask from the (8,128)
            # i32-comparison tiling to bf16's (16,128), which it rejects
            onehot = jnp.where(iota_win == jnp.broadcast_to(xi, (WIN, LANE)),
                               1.0, 0.0).astype(dtype)
            window = win_full[:, wstart:wstart + WIN]    # [BH*8, WIN]
            # f32 needs HIGHEST (6-pass) for exact taps; bf16 mode uses the
            # native single-pass MXU (and is still EXACT: a one-hot
            # contraction of bf16 values with f32 accumulation selects the
            # bf16 values bit-exactly)
            g = jax.lax.dot_general(
                window, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if dtype == jnp.float32 else None))  # [BH*8, LANE]
            top = jnp.zeros((8, LANE), jnp.float32)
            bot = jnp.zeros((8, LANE), jnp.float32)
            for s in range(BH):
                sel_t = jnp.broadcast_to(yi == s, (8, LANE))
                sel_b = jnp.broadcast_to(yi == s - 1, (8, LANE))
                gs = g[s * 8:(s + 1) * 8, :]
                top = jnp.where(sel_t, gs, top)
                bot = jnp.where(sel_b, gs, bot)
            if fuse_out:
                out_ref[0, i, :, lane0:lane0 + LANE] = (
                    jnp.concatenate([top, bot], axis=0).astype(out_ref.dtype))
            else:
                top_ref[0, i, :, lane0:lane0 + LANE] = top
                bot_ref[0, i, :, lane0:lane0 + LANE] = bot


def _pack_source(image, padding_mode, dtype=jnp.float32):
    """[B,H,W,C<=3] -> padded tap-packed [B, Hp, 8, Wpad] in `dtype`."""
    B, H, W, C = image.shape
    mode = 'constant' if padding_mode == 'zeros' else 'edge'
    P = jnp.pad(image.astype(dtype),
                ((0, 0), (2, 2), (2, 2), (0, 0)), mode=mode)
    right = jnp.concatenate([P[:, :, 1:], P[:, :, -1:]], axis=2)
    packed = jnp.concatenate([P, right], axis=-1).transpose(0, 1, 3, 2)
    Hp, Wp = H + 4, W + 4
    # at least WIN lanes so the static chunk windows always fit; at least
    # TILE_BAND rows so the per-tile DMA slice always fits (the zero rows
    # are never selected: yc <= Hp-2 and the ylocal selects stay in-image)
    wpad = max(_cdiv(Wp, LANE) * LANE, WIN)
    packed = jnp.pad(packed,
                     ((0, 0), (0, max(0, TILE_BAND - Hp)),
                      (0, 8 - 2 * C), (0, wpad - Wp)))
    return packed, max(Hp, TILE_BAND), wpad


def warp_plan(image_shape, grid, padding_mode='zeros'):
    """XLA-side index preparation for the warp kernel.

    Computes the per-tile DMA bases, per-pixel band-local indices, bilinear
    fractions, and the scalar `violation` flag — all cheap vector math the
    caller can run OUTSIDE a lax.cond, so the kernel itself (and the XLA
    fallback) can live INSIDE the cond branches and only the combined
    warped image crosses the branch boundary.

    Returns (plan: dict of arrays/ints, viol: scalar bool).
    """
    B, H, W, C = image_shape
    _, Ho, Wo, _ = grid.shape
    gx, gy = grid[..., 0], grid[..., 1]
    x = (gx + 1.0) * 0.5 * (W - 1)
    y = (gy + 1.0) * 0.5 * (H - 1)
    if padding_mode == 'border':
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # Same MISCOMPILE GUARD as ops/image.py _gs_patches: XLA:TPU can fuse
    # floor() into both the index computation (xc/yc below) and the
    # fractions and diverge the two copies (wx == 0.5 at ~40% of pixels;
    # scripts/repro_xla_gather_miscompile.py). Pin one floor result.
    x0, y0 = jax.lax.optimization_barrier((x0, y0))
    wx = (x - x0).astype(jnp.float32)
    wy = (y - y0).astype(jnp.float32)

    Wp = W + 4
    Hp_real = H + 4
    Hp = max(Hp_real, TILE_BAND)  # _pack_source pads short sources to the band
    wpad = max(_cdiv(Wp, LANE) * LANE, WIN)
    xc = jnp.clip(x0 + 2.0, 0, Wp - 2).astype(jnp.int32)   # [B,Ho,Wo]
    # clip against the REAL padded-image height (XLA-path parity: samples
    # clamp into the 2-pixel dead border, never into the band-fill rows)
    yc = jnp.clip(y0 + 2.0, 0, Hp_real - 2).astype(jnp.int32)

    # pad output geometry to kernel granularity (edge mode: zero padding
    # would poison the per-row band minima)
    wo_pad = _cdiv(Wo, LANE) * LANE
    ho_pad = _cdiv(Ho, TILE_ROWS) * TILE_ROWS
    if (wo_pad, ho_pad) != (Wo, Ho):
        padspec = ((0, 0), (0, ho_pad - Ho), (0, wo_pad - Wo))
        xc = jnp.pad(xc, padspec, mode='edge')
        yc = jnp.pad(yc, padspec, mode='edge')
    n_chunks = wo_pad // LANE
    n_t = ho_pad // TILE_ROWS

    # per-row band bases and locals
    base_r = jnp.min(yc, axis=2)                           # [B,Ho']
    base_r = jnp.minimum(base_r, Hp - BH)
    ylocal = yc - base_r[:, :, None]
    viol = jnp.any(ylocal > BH - 2)
    # per-tile DMA base
    base_rt = base_r.reshape(B, n_t, TILE_ROWS)
    base_t = jnp.minimum(jnp.min(base_rt, axis=2), Hp - TILE_BAND)
    rowoff = base_rt - base_t[:, :, None]                  # [B,n_t,TILE_ROWS]
    viol = viol | jnp.any(rowoff > TILE_BAND - BH)
    # lane-chunk displacement band
    cidx = (jnp.arange(wo_pad) // LANE)
    wstart = jnp.minimum(jnp.maximum(0, (cidx - 1) * LANE), wpad - WIN)
    xloc = xc - wstart[None, None, :]
    viol = viol | jnp.any((xloc < 0) | (xloc >= WIN))
    xloc = jnp.clip(xloc, 0, WIN - 1) + wstart[None, None, :]  # abs, safe
    ylocal = jnp.clip(ylocal, 0, BH - 2)

    plan = dict(base_t=base_t, rowoff=rowoff, xloc=xloc, ylocal=ylocal,
                wx=wx, wy=wy, n_chunks=n_chunks, n_t=n_t,
                wo_pad=wo_pad, ho_pad=ho_pad, wpad=wpad)
    return plan, viol


def warp_taps_from_plan(image, plan, padding_mode='zeros',
                        dtype=jnp.float32, interpret=False):
    """Run the warp kernel given a prepared plan. Returns (p00,p01,p10,p11)."""
    interpret = interpret or INTERPRET
    B, H, W, C = image.shape
    packed, Hp, wpad = _pack_source(image, padding_mode, dtype)
    assert wpad == plan['wpad']
    n_chunks, n_t = plan['n_chunks'], plan['n_t']
    wo_pad, ho_pad = plan['wo_pad'], plan['ho_pad']
    Ho, Wo = plan['wx'].shape[1], plan['wx'].shape[2]
    base_t, rowoff = plan['base_t'], plan['rowoff']
    xloc, ylocal = plan['xloc'], plan['ylocal']

    # bf16 kernels write ONE fused bf16 output ref (16 sublanes = top+bot,
    # exactly one bf16 tile per [16, LANE] store) — half the output HBM
    # traffic of the two-f32-ref layout, with bit-identical taps (bf16
    # sources only).
    fuse_out = dtype == jnp.bfloat16
    if fuse_out:
        out_specs = [pl.BlockSpec((1, TILE_ROWS, 16, wo_pad),
                                  lambda b, t, *_: (b, t, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((B, ho_pad, 16, wo_pad),
                                          jnp.bfloat16)]
    else:
        out_specs = [pl.BlockSpec((1, TILE_ROWS, 8, wo_pad),
                                  lambda b, t, *_: (b, t, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        out_shape = [jax.ShapeDtypeStruct((B, ho_pad, 8, wo_pad),
                                          jnp.float32)] * 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # packed src
            pl.BlockSpec((1, TILE_ROWS, wo_pad),
                         lambda b, t, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),         # xloc (abs)
            pl.BlockSpec((1, TILE_ROWS, wo_pad),
                         lambda b, t, *_: (b, t, 0),
                         memory_space=pltpu.VMEM),         # ylocal
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((TILE_BAND, 8, wpad), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_warp_kernel, n_chunks, wpad, dtype, fuse_out),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(base_t.reshape(-1), rowoff.reshape(-1), packed, xloc, ylocal)

    if fuse_out:
        tb = outs[0][:, :Ho, :, :Wo]
        top, bot = tb[:, :, :8], tb[:, :, 8:]
    else:
        top, bot = outs[0][:, :Ho, :, :Wo], outs[1][:, :Ho, :, :Wo]
    top = top.transpose(0, 1, 3, 2)                        # [B,Ho,Wo,8]
    bot = bot.transpose(0, 1, 3, 2)
    p00, p01 = top[..., :C], top[..., C:2 * C]
    p10, p11 = bot[..., :C], bot[..., C:2 * C]
    return p00, p01, p10, p11


def warp_taps_pallas(image, grid, padding_mode='zeros', dtype=jnp.float32,
                     interpret=False):
    """Pallas replacement for the gather in ops.image._gs_patches.

    Returns (p00, p01, p10, p11, wx, wy, violation) — identical tap
    semantics to the XLA packed-tap path; `violation` is a scalar bool that
    is True when the flow leaves the kernel's displacement band (caller
    must then use the XLA path).
    """
    plan, viol = warp_plan(image.shape, grid, padding_mode)
    p00, p01, p10, p11 = warp_taps_from_plan(image, plan, padding_mode,
                                             dtype, interpret)
    return p00, p01, p10, p11, plan['wx'], plan['wy'], viol


def warp_pallas_supported(image, grid):
    """Static eligibility for the Pallas warp path."""
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    # short sources are band-padded in _pack_source, so height is
    # unconstrained; gate on channel packing + enough work to amortize
    return (C <= 3 and Ho * Wo >= 16 * LANE
            and (jax.default_backend() == 'tpu' or INTERPRET))
