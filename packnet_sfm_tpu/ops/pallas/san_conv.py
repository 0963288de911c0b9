"""
Block-sparse masked conv — the Pallas kernel under the SAN LiDAR branch.

Why: the MinkowskiEngine-replacement runs *dense* convs on masked (zero-
filled) LiDAR feature maps (networks/layers/san.py) — ~2/3 of the flagship
supervised step's FLOPs. But projected LiDAR has strong ROW structure: the
top ~40% of a KITTI frame is above the sensor's field of view and the mask
is empty there at EVERY pyramid scale (OR-pooling only dilates the active
band downward). XLA cannot skip work based on runtime values; this kernel
can: a per-(image, row-tile) activity flag is computed outside (one cheap
mask reduction) and scalar-prefetched, and inactive tiles skip the entire
MXU contraction and just write zeros.

Formulation per grid cell (b, row-tile):
- DMA a (TILE_ROWS + k - 1)-row band of the zero-padded NHWC source into
  VMEM once.
- accumulate over the k*k taps: for tap (dy, dx) the TILE_ROWS output rows
  read band rows dy..dy+TILE_ROWS-1 shifted by dx — a contiguous
  [TILE_ROWS*W, Cin] slab — and one MXU contraction with K[dy, dx]
  ([Cin, Cout]) adds into an fp32 accumulator. k*k matmuls with
  contraction Cin replace XLA's conv.
- epilogue fuses what the masked-dense stack does as separate HBM passes:
  + bias, * output mask (sparse-conv semantics: inactive sites are exactly
  zero — networks/layers/san.py invariant).

The backward is expressed with the same kernel: dx = masked-conv of the
(already mask-zeroed) cotangent with the spatially-flipped, IO-transposed
kernel, using row-dilated activity flags; dW/db fall back to XLA's conv
filter-backprop on the saved masked tensors (a single well-shaped deep
matmul XLA handles at peak; there is no row-skip win left in it worth a
second kernel).

Reference semantics being accelerated: MinkowskiEngine sparse convolution
(reference: networks/layers/minkowski.py:32-78, minkowski_encoder.py:12-87)
== mask_out * dense_conv(mask_in * x).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 8


def _cdiv(a, b):
    return -(-a // b)


def _conv_kernel(k, W, cin, cout, dtype, flags_ref,
                 src_ref, kern_ref, bias_ref, mask_ref, out_ref,
                 band, sem):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    flag = flags_ref[b * n_t + t]

    @pl.when(flag == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(flag != 0)
    def _():
        dma = pltpu.make_async_copy(
            src_ref.at[b, pl.ds(t * TILE_ROWS, TILE_ROWS + k - 1)],
            band, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((TILE_ROWS * W, cout), jnp.float32)
        for dy in range(k):
            for dx in range(k):
                # rows dy..dy+TILE_ROWS-1, cols dx..dx+W-1: one contiguous
                # slab covering all TILE_ROWS output rows for this tap
                slab = band[dy:dy + TILE_ROWS, dx:dx + W, :]
                lhs = slab.reshape(TILE_ROWS * W, cin)
                acc += jax.lax.dot_general(
                    lhs, kern_ref[dy, dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc += bias_ref[0].astype(jnp.float32)
        out3 = acc.reshape(TILE_ROWS, W, cout)
        m = mask_ref[0].astype(jnp.float32)        # [TILE_ROWS, W, 1]
        out_ref[0] = (out3 * m).astype(out_ref.dtype)


def tile_activity(mask, k):
    """Per-(image, TILE_ROWS-row band) activity flags from [B,H,W,1] mask.

    A tile must run when any OUTPUT site in its rows is active; output
    sites are exactly the mask's active sites (sparse-conv semantics), so
    the flag is an OR over the tile's own rows — the halo only affects
    which INPUT rows are read, not whether outputs exist.
    """
    B, H, W, _ = mask.shape
    ho = _cdiv(H, TILE_ROWS) * TILE_ROWS
    m = jnp.pad(mask[..., 0] > 0, ((0, 0), (0, ho - H), (0, 0)))
    return jnp.any(m.reshape(B, ho // TILE_ROWS, TILE_ROWS * W),
                   axis=2).astype(jnp.int32)


def masked_conv2d_pallas(x, mask, kernel, bias, flags=None, interpret=False):
    """out = (conv_same(x, kernel) + bias) * mask, skipping inactive row
    tiles. x [B,H,W,Cin], mask [B,H,W,1], kernel [k,k,Cin,Cout] (flax
    nn.Conv layout), bias [Cout]. `flags` ([B, n_t] int32) defaults to
    tile_activity(mask, k)."""
    B, H, W, Cin = x.shape
    k = kernel.shape[0]
    Cout = kernel.shape[-1]
    p = k // 2
    dtype = x.dtype

    if flags is None:
        flags = tile_activity(mask, k)

    ho = _cdiv(H, TILE_ROWS) * TILE_ROWS
    n_t = ho // TILE_ROWS
    # zero-pad: spatial halo + row-tile rounding ('same' conv padding).
    # Width is padded to a sublane multiple (8) and channels to a lane
    # multiple (128) — Mosaic requires manual-DMA slice extents aligned to
    # the tiling; zero channels contribute zero to the contraction.
    wp = _cdiv(W + 2 * p, 8) * 8
    cp = _cdiv(Cin, 128) * 128
    xp = jnp.pad(x, ((0, 0), (p, p + ho - H), (p, wp - W - p),
                     (0, cp - Cin)))
    kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cp - Cin), (0, 0)))
    mp = jnp.pad(mask, ((0, 0), (0, ho - H), (0, 0), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # padded src
            pl.BlockSpec(memory_space=pltpu.VMEM),         # kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),         # bias [1,Cout]
            pl.BlockSpec((1, TILE_ROWS, W, 1),
                         lambda b, t, *_: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),         # mask
        ],
        out_specs=pl.BlockSpec((1, TILE_ROWS, W, Cout),
                               lambda b, t, *_: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_ROWS + k - 1, wp, cp), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_conv_kernel, k, W, cp, Cout, dtype),
        out_shape=jax.ShapeDtypeStruct((B, ho, W, Cout), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(flags.reshape(-1), xp, kernel.astype(dtype),
      bias.reshape(1, -1).astype(dtype), mp)
    return out[:, :H]


def _dense_oracle(x, kernel, bias, mask):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    return ((y + bias.astype(jnp.float32)) * mask).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def masked_conv2d(x, mask, kernel, bias, flags, interpret=False):
    """Differentiable block-sparse masked conv (see masked_conv2d_pallas).

    Forward runs the Pallas kernel; backward reuses it for dx (flipped,
    IO-transposed kernel over the masked cotangent with row-dilated flags)
    and XLA's conv filter-backprop for dW."""
    return masked_conv2d_pallas(x, mask, kernel, bias, flags,
                                interpret=interpret)


def _mc_fwd(x, mask, kernel, bias, flags, interpret):
    out = masked_conv2d_pallas(x, mask, kernel, bias, flags,
                               interpret=interpret)
    return out, (x, mask, kernel, flags)


def _mc_bwd(interpret, res, g):
    x, mask, kernel, flags = res
    k = kernel.shape[0]
    # d(out)/d(conv) = mask; compute the whole backward in the primal
    # dtype (the XLA masked-dense path differentiates in bf16 the same way)
    gm = (g * mask.astype(g.dtype)).astype(x.dtype)
    # dx: conv of gm with spatially-flipped, IO-transposed kernel. gm's
    # active rows extend dx's support by the halo -> dilate flags one tile
    # each way (TILE_ROWS >= k//2 always holds here).
    B, n_t = flags.shape
    fpad = jnp.pad(flags, ((0, 0), (1, 1)))
    dil = jnp.maximum(jnp.maximum(fpad[:, :-2], fpad[:, 1:-1]), fpad[:, 2:])
    kT = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    ones_mask = jnp.ones_like(mask)
    dx = masked_conv2d_pallas(gm, ones_mask, kT,
                              jnp.zeros((kT.shape[-1],), kT.dtype),
                              dil, interpret=interpret)
    # dW / db: XLA's conv filter-backprop on the saved masked tensors, in
    # the primal dtype (preferred_element_type=f32 here would make the
    # conv transpose rule mix a f32 cotangent with the bf16 lhs and fail)
    def conv_only(kern, b):
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + b.astype(y.dtype)
    _, wb_vjp = jax.vjp(conv_only, kernel, jnp.zeros_like(kernel[0, 0, 0]))
    dkernel, dbias = wb_vjp(gm)
    dmask = jnp.zeros_like(mask)
    dflags = np.zeros(flags.shape, jax.dtypes.float0)
    return dx, dmask, dkernel, dbias, dflags


masked_conv2d.defvjp(_mc_fwd, _mc_bwd)
