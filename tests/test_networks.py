"""Shape/behaviour tests for the network zoo (CPU, tiny inputs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.networks import (
    ResNetSAN01, DepthResNet, PackNet01, PackNetSlim01, PackNetSAN01,
    PoseNet, PoseResNet)

B, H, W = 2, 64, 96


@pytest.fixture(scope='module')
def rgb():
    return jnp.asarray(np.random.RandomState(0).rand(B, H, W, 3), jnp.float32)


@pytest.fixture(scope='module')
def sparse_depth():
    rng = np.random.RandomState(1)
    d = rng.rand(B, H, W, 1).astype(np.float32) * 10
    mask = rng.rand(B, H, W, 1) < 0.05
    return jnp.asarray(d * mask)


def _init_and_run(net, *args, train=True, **kwargs):
    variables = net.init({'params': jax.random.PRNGKey(0)}, *args,
                         train=train, **kwargs)
    out, _ = net.apply(variables, *args, train=train, **kwargs,
                       mutable=['batch_stats'])
    return out


def test_resnet_san_rgb_only(rgb):
    net = ResNetSAN01(version='18A')
    out = _init_and_run(net, rgb)
    assert len(out['inv_depths']) == 4
    d0 = out['inv_depths'][0]
    assert d0.shape == (B, H, W, 1)
    v = np.asarray(d0)
    assert (v >= 0).all() and (v <= 1).all()  # raw sigmoids
    # scale pyramid: each scale halves resolution
    for i, d in enumerate(out['inv_depths']):
        assert d.shape == (B, H // 2 ** i, W // 2 ** i, 1)


def test_resnet_san_with_lidar(rgb, sparse_depth):
    net = ResNetSAN01(version='18A', use_film=True, film_scales=(0,))
    out = _init_and_run(net, rgb, sparse_depth)
    assert 'inv_depths_rgbd' in out
    assert 'depth_loss' in out
    assert np.isfinite(float(out['depth_loss']))


def test_resnet_san_row_window_exact_parity(rgb):
    """san_row_window crop must be bit-exact vs the full computation when
    the LiDAR band (+ margins) fits the window (row-structured mask in the
    bottom band, KITTI-like)."""
    rng = np.random.RandomState(2)
    d = rng.rand(B, H, W, 1).astype(np.float32) * 10
    mask = np.zeros((B, H, W, 1), np.float32)
    rows = np.arange(40, H)          # band [40, 63] touches the bottom
    fill = rng.rand(B, len(rows), W, 1) < 0.2
    mask[:, rows] = fill
    sd = jnp.asarray(d * mask)

    full = ResNetSAN01(version='18A', use_film=True, film_scales=(0,))
    crop = ResNetSAN01(version='18A', use_film=True, film_scales=(0,),
                       san_row_window=0.5)
    variables = full.init({'params': jax.random.PRNGKey(0)}, rgb, sd,
                          train=True)
    out_f, _ = full.apply(variables, rgb, sd, train=True,
                          mutable=['batch_stats'])
    out_c, aux = crop.apply(variables, rgb, sd, train=True,
                            mutable=['batch_stats', 'intermediates'])
    dropped = jax.tree_util.tree_leaves(
        aux['intermediates'])[0]
    assert float(dropped) == 0.0
    for a, b in zip(out_f['inv_depths_rgbd'], out_c['inv_depths_rgbd']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
    np.testing.assert_allclose(float(out_f['depth_loss']),
                               float(out_c['depth_loss']), atol=1e-6)


def test_resnet_san_row_window_counts_dropped(rgb, sparse_depth):
    """A full-height iid mask cannot fit a half-height window — the crop
    must count the dropped active sites (and still run)."""
    crop = ResNetSAN01(version='18A', use_film=True, film_scales=(0,),
                       san_row_window=0.5)
    variables = crop.init({'params': jax.random.PRNGKey(0)}, rgb,
                          sparse_depth, train=True)
    out, aux = crop.apply(variables, rgb, sparse_depth, train=True,
                          mutable=['batch_stats', 'intermediates'])
    dropped = jax.tree_util.tree_leaves(aux['intermediates'])[0]
    assert float(dropped) > 0
    assert np.isfinite(float(out['depth_loss']))


def test_packnet_san_row_window_exact_parity(rgb):
    rng = np.random.RandomState(3)
    d = rng.rand(B, H, W, 1).astype(np.float32) * 10
    mask = np.zeros((B, H, W, 1), np.float32)
    rows = np.arange(40, H)
    mask[:, rows] = (rng.rand(B, len(rows), W, 1) < 0.2)
    sd = jnp.asarray(d * mask)

    full = PackNetSAN01(version='1A')
    crop = PackNetSAN01(version='1A', san_row_window=0.5)
    variables = full.init({'params': jax.random.PRNGKey(0)}, rgb, sd,
                          train=True)
    out_f, _ = full.apply(variables, rgb, sd, train=True,
                          mutable=['batch_stats'])
    out_c, _ = crop.apply(variables, rgb, sd, train=True,
                          mutable=['batch_stats'])
    for a, b in zip(out_f['inv_depths_rgbd'], out_c['inv_depths_rgbd']):
        # reduction-order noise only (BN stats sum over a cropped tensor)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_resnet_san_dual_head(rgb):
    net = ResNetSAN01(version='18A', use_dual_head=True, max_depth=15.0)
    out = _init_and_run(net, rgb)
    assert ('integer', 0) in out and ('fractional', 0) in out
    assert out[('integer', 0)].shape == (B, H, W, 1)


def test_resnet_san_eval_single_scale(rgb):
    net = ResNetSAN01(version='18A')
    variables = net.init({'params': jax.random.PRNGKey(0)}, rgb, train=True)
    out = net.apply(variables, rgb, train=False)
    assert len(out['inv_depths']) == 1


def test_depth_resnet(rgb):
    out = _init_and_run(DepthResNet(version='18pt'), rgb)
    d = np.asarray(out['inv_depths'][0])
    assert (d >= 1 / 100.0 - 1e-6).all() and (d <= 1 / 0.1 + 1e-6).all()


@pytest.mark.parametrize('cls,version', [
    (PackNet01, '1A'), (PackNet01, '1B'), (PackNetSlim01, '1A')])
def test_packnet(rgb, cls, version):
    out = _init_and_run(cls(version=version), rgb)
    assert len(out['inv_depths']) == 4
    assert out['inv_depths'][0].shape == (B, H, W, 1)


def test_packnet_san(rgb, sparse_depth):
    out = _init_and_run(PackNetSAN01(version='1A'), rgb, sparse_depth)
    assert 'inv_depths_rgbd' in out and 'depth_loss' in out


def test_packnet_slim_san_film(rgb, sparse_depth):
    """Slim-SAN FiLM mode: 6-scale fusion incl. the full-res pre_calc skip,
    gates init 0.5, FiLM generators on the film scales only, the sparse
    branch descending exactly len(film_scales) stages (reference:
    PackNetSlimSAN01.py:16,90-196)."""
    from packnet_sfm_tpu.networks import PackNetSlimSAN01
    net = PackNetSlimSAN01(version='1A', use_film=True, film_scales=(0, 1))
    variables = net.init({'params': jax.random.PRNGKey(0)}, rgb,
                         sparse_depth, train=True)
    p = variables['params']
    assert p['weight'].shape == (6,)
    assert np.allclose(np.asarray(p['weight']), 0.5)
    assert {'film_0', 'film_1'} <= set(p['mconvs'].keys())
    out, _ = net.apply(variables, rgb, sparse_depth, train=True,
                       mutable=['batch_stats'])
    assert 'inv_depths_rgbd' in out and 'depth_loss' in out
    assert out['inv_depths'][0].shape == (B, H, W, 1)
    assert np.isfinite(float(out['depth_loss']))
    # slim defaults FiLM ON (reference PackNetSlimSAN01.py:16); the plain
    # 5-gate fusion needs an explicit opt-out
    assert PackNetSlimSAN01(version='1A').use_film
    plain = PackNetSlimSAN01(version='1A', use_film=False)
    v2 = plain.init({'params': jax.random.PRNGKey(0)}, rgb, sparse_depth,
                    train=True)
    assert v2['params']['weight'].shape == (5,)


def test_packnet_slim_san_film_grads_finite(rgb, sparse_depth):
    from packnet_sfm_tpu.networks import PackNetSlimSAN01
    net = PackNetSlimSAN01(version='1A', use_film=True, film_scales=(0, 1))
    variables = net.init({'params': jax.random.PRNGKey(0)}, rgb,
                         sparse_depth, train=True)

    def loss_fn(params):
        out, _ = net.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            rgb, sparse_depth, train=True, mutable=['batch_stats'])
        return (sum(jnp.mean(x) for x in out['inv_depths_rgbd'])
                + out['depth_loss'])

    grads = jax.grad(loss_fn)(variables['params'])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # FiLM generator gradients flow
    gf = grads['mconvs']['film_0']
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree_util.tree_leaves(gf))


def test_posenet(rgb):
    ctx = [rgb, rgb]
    net = PoseNet(nb_ref_imgs=2)
    variables = net.init({'params': jax.random.PRNGKey(0)}, rgb, ctx)
    pose = net.apply(variables, rgb, ctx)
    assert pose.shape == (B, 2, 6)
    assert float(jnp.abs(pose).max()) < 1.0  # 0.01-scaled output


def test_pose_resnet(rgb):
    ctx = [rgb, rgb]
    net = PoseResNet(version='18pt')
    out = _init_and_run(net, rgb, ctx)
    assert out.shape == (B, 2, 6)


# ---------------------------------------------------------------- auto window

def test_calibrate_row_window_covers_band():
    """Auto row-window sizing: band + exactness margins, 32-aligned,
    consumer round-trip (int(H*frac)//32*32) lossless."""
    from packnet_sfm_tpu.networks.layers.san import calibrate_san_row_window
    Hc, Wc = 192, 64
    rng = np.random.RandomState(0)
    ds = []
    for i in range(4):
        d = np.zeros((Hc, Wc, 1), np.float32)
        d[80:150] = (rng.rand(70, Wc, 1) < 0.3) * 5.0   # band [80, 149]
        ds.append({'input_depth': d})
    frac = calibrate_san_row_window(ds)
    assert 0.0 < frac < 1.0
    Hw = int(Hc * frac) // 32 * 32
    # top anchor 64 (80//32*32), bottom needs 149+1+63(+32 safety) clamped
    # to 192 -> window 128 rows
    assert Hw == 128


def test_calibrate_row_window_disables_without_lidar_or_gain():
    from packnet_sfm_tpu.networks.layers.san import calibrate_san_row_window
    # no input_depth key -> disabled
    assert calibrate_san_row_window([{'rgb': np.zeros((8, 8, 3))}]) == 0.0
    # empty dataset -> disabled
    assert calibrate_san_row_window([]) == 0.0
    # all-empty masks -> disabled
    ds = [{'input_depth': np.zeros((96, 32, 1), np.float32)}]
    assert calibrate_san_row_window(ds) == 0.0
    # full-height band -> window would not be smaller than the image
    full = np.ones((96, 32, 1), np.float32)
    assert calibrate_san_row_window([{'input_depth': full}]) == 0.0
