"""Reproduction: XLA:TPU miscompiles the packed-tap grid_sample gather
(ops/image._gs_patches) at the selfsup training shape.

Observed on v5e (round 3, jax 0.9.0 via the axon tunnel): the compiled
program returns wx == 0.5 EXACTLY at ~40% of pixels (including pixels whose
true fraction is 0.0), and corrupts p11 at a handful of last-row pixels.
Deterministic across runs and processes; wy and p00/p01/p10 are correct;
the same program is exact on CPU and in Pallas-interpret mode, and the
Pallas matmul-gather kernel (ops/pallas/warp.py) computing the identical
taps is exact on TPU (verified against numpy ground truth — see
BENCH_NOTES.md round-3 section).

Two distinct defects, each with a measured in-graph guard (both applied
in ops/image._gs_patches, so this script now prints 'no miscompile'
against the fixed implementation; the raw pattern lives in git history):
1. wx == 0.5 corruption at ~40% of pixels: XLA fuses jnp.floor into both
   the gather-index computation and the fraction x - floor(x) and the two
   copies disagree. Guard: jax.lax.optimization_barrier((x0, y0)) pins one
   floor result for both consumers. Measured: 0 wrong pixels.
2. p11 garbage in the LAST channel of the LAST output row (~109 pixels):
   the gather reads past the operand when the buffer ends exactly at its
   reach. Guard: one dummy trailing row on the flattened operand.
   Measured: 0 wrong pixels.

With both guards the XLA packed-tap path is exact on TPU again; the Pallas
matmul-gather kernel (ops/pallas/warp.py) remains as an independently
verified alternative backend (WARP_IMPL switch).

Run on a TPU host:  python scripts/repro_xla_gather_miscompile.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

from packnet_sfm_tpu.ops.image import _gs_patches  # noqa: E402


def main():
    B, H, W = 8, 192, 640
    rng = np.random.RandomState(0)
    img = rng.rand(B, H, W, 3).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing='ij')
    grids = []
    for b in range(B):
        dx = 40.0 * np.sin(xs / 97.0 + b) * (ys / H + 0.2)
        dy = 2.0 * np.cos(xs / 131.0 + b * 0.7)
        grids.append(np.stack([2.0 * (xs + dx) / (W - 1) - 1.0,
                               2.0 * (ys + dy) / (H - 1) - 1.0], -1))
    grid = np.stack(grids).astype(np.float32)

    res = jax.jit(lambda i, g: _gs_patches(i, g, 'zeros'))(
        jnp.asarray(img), jnp.asarray(grid))
    wx = np.asarray(res[4])
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    wx_true = x - np.floor(x)
    bad = np.abs(wx - wx_true) > 1e-5
    print('platform:', jax.default_backend())
    print('wx wrong at {}/{} pixels'.format(bad.sum(), bad.size))
    if bad.any():
        b, r, c = np.argwhere(bad)[0]
        print('e.g. ({},{},{}): true {:.6f}, got {:.6f}'.format(
            b, r, c, wx_true[b, r, c], wx[b, r, c]))
        print('MISCOMPILE REPRODUCED')
        return 1
    print('no miscompile on this backend/version')
    return 0


if __name__ == '__main__':
    sys.exit(main())
