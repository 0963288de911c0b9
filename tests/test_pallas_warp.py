"""Parity of the Pallas matmul-gather warp kernel (ops/pallas/warp.py)
against the XLA packed-tap oracle (ops/image._gs_patches), interpreter
mode on CPU; the real-TPU numbers live in BENCH_NOTES.md.

Covers: smooth SfM-like flows (in-band), zeros/border padding at image
edges, non-128-multiple output widths, and the violation flag on flows
that leave the displacement band.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from packnet_sfm_tpu.ops.image import _gs_patches
from packnet_sfm_tpu.ops.pallas.warp import warp_taps_pallas

pytestmark = pytest.mark.quick


def _flow_grid(B, H, W, rng, dx_amp=30.0, dy_amp=2.5):
    """Smooth SfM-like flow in normalized coords."""
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing='ij')
    phase = rng.rand(B, 1, 1) * 6.28
    dx = dx_amp * jnp.sin(xs[None] / 97.0 + phase) * (ys[None] / H + 0.2)
    dy = dy_amp * jnp.cos(xs[None] / 131.0 + phase)
    x = xs[None] + dx
    y = ys[None] + dy
    gx = 2.0 * x / (W - 1) - 1.0
    gy = 2.0 * y / (H - 1) - 1.0
    return jnp.stack([gx, gy], axis=-1)


@pytest.mark.parametrize('padding_mode', ['zeros', 'border'])
@pytest.mark.parametrize('shape', [(2, 64, 256), (1, 48, 200)])
def test_warp_taps_matches_xla(padding_mode, shape):
    B, H, W = shape
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    grid = _flow_grid(B, H, W, rng)

    want = _gs_patches(img, grid, padding_mode)
    got = warp_taps_pallas(img, grid, padding_mode, interpret=True)
    assert not bool(got[6]), 'smooth flow must stay in-band'
    for k, name in enumerate(['p00', 'p01', 'p10', 'p11', 'wx', 'wy']):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=1e-5, err_msg=name)


def test_warp_taps_bf16_fused_output_exact():
    """bf16 kernel mode writes ONE fused bf16 output ref (top+bot, 16
    sublanes); taps of a bf16 source must be BIT-exact vs the XLA path."""
    B, H, W = 2, 64, 256
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(B, H, W, 3), jnp.bfloat16)
    grid = _flow_grid(B, H, W, rng)

    want = _gs_patches(img, grid, 'zeros')
    got = warp_taps_pallas(img, grid, 'zeros', dtype=jnp.bfloat16,
                           interpret=True)
    assert not bool(got[6])
    for k, name in enumerate(['p00', 'p01', 'p10', 'p11']):
        assert got[k].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(got[k], dtype=np.float32),
            np.asarray(want[k], dtype=np.float32), err_msg=name)


def test_warp_taps_out_of_band_flags_violation():
    # W=640 has 5 lane chunks, so a 200 px displacement leaves the 3-chunk
    # window (at W<=380 the window covers the whole image and ANY |dx| is
    # legal — correctly no violation)
    B, H, W = 1, 64, 640
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing='ij')
    # 200 px horizontal displacement leaves the 3-chunk window
    x = xs + 200.0 * jnp.sin(xs / 11.0)
    gx = 2.0 * x / (W - 1) - 1.0
    gy = (2.0 * ys / (H - 1) - 1.0)
    grid = jnp.stack([gx, gy], axis=-1)[None]
    got = warp_taps_pallas(img, grid, 'zeros', interpret=True)
    assert bool(got[6])


def test_warp_taps_vertical_span_flags_violation():
    B, H, W = 1, 64, 256
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing='ij')
    # y-span across one output row exceeds BH-2
    y = ys + 20.0 * jnp.sin(xs / 13.0)
    gx = 2.0 * xs / (W - 1) - 1.0
    gy = 2.0 * y / (H - 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)[None]
    got = warp_taps_pallas(img, grid, 'zeros', interpret=True)
    assert bool(got[6])


def test_grid_sample_dispatch_bf16_value_parity(monkeypatch):
    """bf16 sources select taps bit-exactly in the kernel's single-pass
    bf16 contraction — kernel output must equal the XLA path's exactly."""
    import packnet_sfm_tpu.ops.pallas.warp as warp_mod
    import packnet_sfm_tpu.ops.image as image_mod
    monkeypatch.setattr(warp_mod, 'INTERPRET', True)
    monkeypatch.setattr(image_mod, 'WARP_IMPL', 'auto')
    B, H, W = 1, 64, 384
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(B, H, W, 3), jnp.bfloat16)
    grid = _flow_grid(B, H, W, rng, dx_amp=15.0, dy_amp=2.0)
    want = image_mod._gs_combine(*image_mod._gs_patches(img, grid, 'zeros'))
    got = image_mod.grid_sample(img, grid, 'zeros')
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want.astype(jnp.bfloat16),
                                          np.float32), atol=1e-2)


@pytest.mark.parametrize('big_flow', [False, True])
def test_grid_sample_dispatch_value_and_grad_parity(big_flow, monkeypatch):
    """The fused-combine dispatch (kernel inside the violation cond; the
    warped image + the two analytic derivative maps cross the boundary,
    backward is elementwise over them) must match the pure-XLA path in
    value AND
    coordinate gradient — both when the kernel runs (smooth flow) and when
    the violation cond falls back (big_flow)."""
    import packnet_sfm_tpu.ops.pallas.warp as warp_mod
    import packnet_sfm_tpu.ops.image as image_mod
    monkeypatch.setattr(warp_mod, 'INTERPRET', True)
    monkeypatch.setattr(image_mod, 'WARP_IMPL', 'auto')

    B, H, W = 1, 64, 640
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    if big_flow:
        ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing='ij')
        x = xs + 200.0 * jnp.sin(xs / 11.0)
        gx = 2.0 * x / (W - 1) - 1.0
        gy = 2.0 * ys / (H - 1) - 1.0
        grid = jnp.stack([gx, gy], axis=-1)[None]
    else:
        grid = _flow_grid(B, H, W, rng, dx_amp=20.0, dy_amp=2.0)

    def loss_fn(gs):
        def f(g):
            out = gs(img, g, 'zeros')
            return (out ** 2).mean()
        return f

    want = loss_fn(lambda i, g, p: image_mod._gs_combine(
        *image_mod._gs_patches(i, g, p)))
    got = loss_fn(image_mod.grid_sample)
    assert image_mod._pallas_warp_eligible(img, grid)
    np.testing.assert_allclose(np.asarray(got(grid)),
                               np.asarray(want(grid)), atol=1e-6)
    g_got = jax.grad(got)(grid)
    g_want = jax.grad(want)(grid)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               atol=1e-5)


def test_grid_sample_dispatch_cpu_uses_xla():
    """On CPU the dispatcher must silently use the XLA path."""
    from packnet_sfm_tpu.ops.image import grid_sample
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(1, 16, 144, 3).astype(np.float32))
    grid = _flow_grid(1, 16, 144, rng, dx_amp=3.0, dy_amp=1.0)
    out = grid_sample(img, grid)
    assert out.shape == (1, 16, 144, 3)
    assert bool(jnp.isfinite(out).all())
