"""Export path: flax -> torch mirror numeric parity + ONNX export."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from packnet_sfm_tpu.networks.depth.resnet_san import ResNetSAN01
from packnet_sfm_tpu.export.torch_mirror import (
    load_resnet_san_into_torch, export_onnx)
from packnet_sfm_tpu.ops.depth import sigmoid_to_inv_depth, inv2depth


@pytest.fixture(scope='module')
def trained_variables():
    net = ResNetSAN01(version='18A', min_depth=0.5, max_depth=15.0)
    rgb = jnp.asarray(np.random.RandomState(0).rand(1, 32, 64, 3),
                      jnp.float32)
    variables = net.init({'params': jax.random.PRNGKey(3)}, rgb, train=True)
    # one mutable forward so batch_stats move off their init values
    _, mut = net.apply(variables, rgb, train=True, mutable=['batch_stats'])
    return net, {'params': variables['params'],
                 'batch_stats': mut['batch_stats']}


def test_torch_mirror_matches_jax(trained_variables):
    net, variables = trained_variables
    rng = np.random.RandomState(1)
    rgb = rng.rand(1, 32, 64, 3).astype(np.float32)
    jax_out = net.apply(variables, jnp.asarray(rgb), train=False)
    sig = np.asarray(jax_out['inv_depths'][0])
    depth_jax = np.asarray(inv2depth(sigmoid_to_inv_depth(
        jnp.asarray(sig), 0.5, 15.0)))

    tnet = load_resnet_san_into_torch(variables, num_layers=18,
                                      min_depth=0.5, max_depth=15.0)
    with torch.no_grad():
        depth_t = tnet(torch.from_numpy(
            rgb.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(depth_t, depth_jax, rtol=1e-3, atol=1e-3)


def test_onnx_export(tmp_path, trained_variables):
    net, variables = trained_variables
    tnet = load_resnet_san_into_torch(variables, num_layers=18,
                                      min_depth=0.5, max_depth=15.0)
    path = str(tmp_path / 'depth.onnx')
    out_path = export_onnx(tnet, path, height=64, width=96)
    import os
    assert os.path.getsize(out_path) > 100000
    if out_path.endswith('.torchscript.pt'):
        # validate the traced artifact numerically
        loaded = torch.jit.load(out_path)
        x = torch.rand(1, 3, 64, 96)
        with torch.no_grad():
            np.testing.assert_allclose(loaded(x).numpy(), tnet(x).numpy(),
                                       rtol=1e-5, atol=1e-5)
