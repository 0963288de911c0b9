"""The two _Conv3DStack implementations are the same math: the depth-window
2D formulation must equal the literal Conv3D bit-for-bit up to fp32
accumulation (weight remap K2d[kh,kw,dz,j] = K3d[dz,kh,kw,0,j])."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.quick

from packnet_sfm_tpu.networks.layers.packnet import _Conv3DStack


def test_conv3d_impl_equivalence():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 16).astype(np.float32))

    m3 = _Conv3DStack(d=4, impl='conv3d')
    v3 = m3.init(jax.random.PRNGKey(0), x)
    out3 = m3.apply(v3, x)

    k3 = v3['params']['Conv_0']['kernel']      # [3,3,3,1,d] (dz,kh,kw,1,d)
    k2 = jnp.transpose(k3[:, :, :, 0, :], (1, 2, 0, 3))  # [kh,kw,dz,d]
    b = v3['params']['Conv_0']['bias']

    m2 = _Conv3DStack(d=4, impl='depthwin2d')
    v2 = m2.init(jax.random.PRNGKey(1), x)
    assert v2['params']['win2d_kernel'].shape == k2.shape
    out2 = m2.apply({'params': {'win2d_kernel': k2, 'win2d_bias': b}}, x)

    np.testing.assert_allclose(np.asarray(out3), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('impl', ['shifts', 'grouped3'])
def test_conv3d_alt_impl_equivalence(impl):
    """The shift-accumulate and single-grouped-conv formulations equal the
    literal Conv3D with the same weight remap (win2d_kernel [kh,kw,dz,j])."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 12, 16).astype(np.float32))

    m3 = _Conv3DStack(d=4, impl='conv3d')
    v3 = m3.init(jax.random.PRNGKey(0), x)
    out3 = m3.apply(v3, x)

    k3 = v3['params']['Conv_0']['kernel']
    k2 = jnp.transpose(k3[:, :, :, 0, :], (1, 2, 0, 3))  # [kh,kw,dz,d]
    b = v3['params']['Conv_0']['bias']

    ms = _Conv3DStack(d=4, impl=impl)
    vs = ms.init(jax.random.PRNGKey(1), x)
    assert vs['params']['win2d_kernel'].shape == k2.shape
    outs = ms.apply({'params': {'win2d_kernel': k2, 'win2d_bias': b}}, x)

    np.testing.assert_allclose(np.asarray(out3), np.asarray(outs),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_alt_impl_grads_match():
    """d(loss)/d(kernel) and d(loss)/dx agree across implementations —
    the tile-broadcast VJP in grouped3 must sum per-group weight grads
    back to the shared [3,3,3,d] kernel."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 6, 10, 8).astype(np.float32))
    kern = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(4).astype(np.float32) * 0.1)

    def loss(impl, kern, bias, x):
        m = _Conv3DStack(d=4, impl=impl)
        y = m.apply({'params': {'win2d_kernel': kern, 'win2d_bias': bias}},
                    x)
        return jnp.sum(jnp.sin(y))

    grads = {}
    for impl in ('depthwise', 'shifts', 'grouped3'):
        grads[impl] = jax.grad(
            lambda k, b, xx: loss(impl, k, b, xx),  # noqa: B023
            argnums=(0, 1, 2))(kern, bias, x)
    for impl in ('shifts', 'grouped3'):
        for g_ref, g in zip(grads['depthwise'], grads[impl]):
            np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g),
                                       rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('k,impl', [(3, 'shifts'), (5, 'shifts'),
                                    (5, 'depthwise'), (3, 'depthwin2d')])
def test_fused_pack_layer_exact(k, impl):
    """PACK_FUSED composes stack+Conv2D into one dense conv with an exact
    two-stage border ring: bit-identical in x64, same param tree."""
    from packnet_sfm_tpu.networks.layers import packnet as pn
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 16, 24, 16
    x = jnp.asarray(rng.randn(B, H, W, C))
    old_impl, old_fused = pn.CONV3D_IMPL, pn.PACK_FUSED
    try:
        pn.CONV3D_IMPL = impl
        pn.PACK_FUSED = False
        m = pn.PackLayerConv3d(features=C, kernel_size=k, d=4)
        v = m.init(jax.random.PRNGKey(0), x)
        out_ref = m.apply(v, x)
        pn.PACK_FUSED = True
        m2 = pn.PackLayerConv3d(features=C, kernel_size=k, d=4)
        v2 = m2.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v2))
        out_f = m2.apply(v, x)
        # fp32 end-to-end: GroupNorm divides by the group std, so tiny
        # accumulation-order differences in the linear part amplify;
        # the linear parts agree to ~2e-6 (x64 run: exactly 0.0)
        np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_f),
                                   rtol=0.0, atol=5e-2)

        def loss(variables, fused):
            pn.PACK_FUSED = fused
            mm = pn.PackLayerConv3d(features=C, kernel_size=k, d=4)
            return jnp.sum(jnp.sin(mm.apply(variables, x)))

        g_ref = jax.grad(loss)(v, False)
        g_f = jax.grad(loss)(v, True)
        for pth_ref, pth_f in zip(
                jax.tree_util.tree_leaves_with_path(g_ref),
                jax.tree_util.tree_leaves_with_path(g_f)):
            np.testing.assert_allclose(
                np.asarray(pth_ref[1]), np.asarray(pth_f[1]),
                rtol=5e-2, atol=5e-2,
                err_msg=str(pth_ref[0]))
    finally:
        pn.CONV3D_IMPL, pn.PACK_FUSED = old_impl, old_fused


def test_conv3d_depthwise_equivalence():
    """The grouped-depthwise formulation equals the literal Conv3D with
    the same weight remap (win2d_kernel layout [kh,kw,dz,j])."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 12, 16).astype(np.float32))

    m3 = _Conv3DStack(d=4, impl='conv3d')
    v3 = m3.init(jax.random.PRNGKey(0), x)
    out3 = m3.apply(v3, x)

    k3 = v3['params']['Conv_0']['kernel']
    k2 = jnp.transpose(k3[:, :, :, 0, :], (1, 2, 0, 3))  # [kh,kw,dz,d]
    b = v3['params']['Conv_0']['bias']

    md = _Conv3DStack(d=4, impl='depthwise')
    vd = md.init(jax.random.PRNGKey(1), x)
    assert vd['params']['win2d_kernel'].shape == k2.shape
    outd = md.apply({'params': {'win2d_kernel': k2, 'win2d_bias': b}}, x)

    np.testing.assert_allclose(np.asarray(out3), np.asarray(outd),
                               rtol=1e-5, atol=1e-5)
