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
    assert v2['params']['win2d']['kernel'].shape == k2.shape
    out2 = m2.apply({'params': {'win2d': {'kernel': k2, 'bias': b}}}, x)

    np.testing.assert_allclose(np.asarray(out3), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)


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
