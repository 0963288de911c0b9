"""
Spatial (context-parallel analogue) sharding: a ('data','spatial') mesh
shards batch AND image height; XLA partitions the convs spatially and
inserts halo exchanges. The sharded forward must match the unsharded one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch
from packnet_sfm_tpu.networks.depth.resnet_san import ResNetSAN01


@pytest.fixture(scope='module')
def net_and_vars():
    net = ResNetSAN01(version='18A')
    rgb = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = net.init({'params': jax.random.PRNGKey(0)}, rgb, train=True)
    return net, variables


def test_spatial_sharded_forward_matches(net_and_vars):
    net, variables = net_and_vars
    assert len(jax.devices()) == 8
    mesh = make_mesh((2, 4), ('data', 'spatial'))

    rng = np.random.RandomState(0)
    rgb = rng.rand(2, 64, 64, 3).astype(np.float32)

    @jax.jit
    def forward(v, x):
        return net.apply(v, x, train=False)['inv_depths'][0]

    ref = np.asarray(forward(variables, jnp.asarray(rgb)))

    batch = shard_batch({'rgb': rgb}, mesh, spatial_axis='spatial')
    x = batch['rgb']
    assert not x.sharding.is_fully_replicated
    out = np.asarray(forward(variables, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_spatial_fallback_when_indivisible(net_and_vars):
    """H not divisible by the spatial axis -> batch-only sharding."""
    mesh = make_mesh((2, 4), ('data', 'spatial'))
    rgb = np.zeros((2, 30, 64, 3), np.float32)  # 30 % 4 != 0
    batch = shard_batch({'rgb': rgb}, mesh, spatial_axis='spatial')
    spec = batch['rgb'].sharding.spec
    assert spec[0] == 'data'
    assert len(spec) == 1 or spec[1] is None


def test_spatial_sharding_film_row_window():
    """The SAN branch (FiLM + active-row-window dynamic slice) compiles and
    matches unsharded under a ('data','spatial') mesh — the dynamic-start
    static-size crop must survive spatial partitioning of H."""
    net = ResNetSAN01(version='18A', use_film=True, film_scales=(0,),
                      san_row_window=0.5)
    rng = np.random.RandomState(1)
    rgb = rng.rand(2, 64, 64, 3).astype(np.float32)
    # active band in the lower half (row-structured LiDAR)
    d = np.zeros((2, 64, 64, 1), np.float32)
    d[:, 36:52] = (rng.rand(2, 16, 64, 1) * 10 + 1) * \
        (rng.rand(2, 16, 64, 1) < 0.2)
    variables = net.init({'params': jax.random.PRNGKey(0)},
                         jnp.asarray(rgb), jnp.asarray(d), train=True)

    @jax.jit
    def forward(v, x, dd):
        return net.apply(v, x, dd, train=False)['inv_depths'][0]

    ref = np.asarray(forward(variables, jnp.asarray(rgb), jnp.asarray(d)))

    mesh = make_mesh((2, 4), ('data', 'spatial'))
    batch = shard_batch({'rgb': rgb, 'input_depth': d}, mesh,
                        spatial_axis='spatial')
    out = np.asarray(forward(variables, batch['rgb'],
                             batch['input_depth']))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
