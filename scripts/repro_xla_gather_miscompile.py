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

Consequence: on TPU the Pallas warp kernel is not just ~3x faster but the
CORRECT path; the dispatcher (ops/image._gs_patches_dispatch) uses it for
all eligible shapes.

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
