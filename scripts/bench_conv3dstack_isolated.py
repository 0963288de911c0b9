"""Isolated fwd+bwd micro-bench of _Conv3DStack across implementations.

The packing stack is PackNet01's signature op (reference
networks/layers/packnet/layers01.py:213-286) and the full-model A/B
(scripts/bench_packnet.py) costs a minutes-scale tunnel compile per impl —
this isolates the op at the real encoder shapes so a formulation can be
picked in seconds before paying for the end-to-end run.

Shapes are PackNet01 1A at 192x640 bs8 (pack1..pack5 post-packing inputs
plus the large unpack stages).

Usage: python scripts/bench_conv3dstack_isolated.py [impl ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, B, H, W, C) — post-packing inputs of the pack layers and the
# Conv2D outputs feeding the unpack layers' Conv3DStack
SHAPES = [
    ('pack1', 8, 96, 320, 256),
    ('pack2', 8, 48, 160, 256),
    ('pack3', 8, 24, 80, 512),
    ('unpack1', 8, 12, 40, 256),
    ('unpack4', 8, 96, 320, 32),
]


def bench_impl(impl, dtype='bfloat16'):
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.networks.layers.packnet import _Conv3DStack

    dt = jnp.bfloat16 if dtype == 'bfloat16' else jnp.float32
    total = 0.0
    rows = []
    for label, B, H, W, C in SHAPES:
        m = _Conv3DStack(d=8, dtype=dt, impl=impl)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(dt)
        variables = m.init(jax.random.PRNGKey(0), x)

        def loss(v, x):
            return jnp.sum(m.apply(v, x).astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        out = g(variables, x)
        jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
        n, best = 8, float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n):
                out = g(variables, x)
            jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
            best = min(best, (time.perf_counter() - t0) / n)
        # ideal HBM traffic: read x + write y(8C) fwd; bwd reads ct(8C),
        # writes dx — ~ (2*1 + 2*8) * numel * bytes
        bytes_ideal = (2 + 16) * B * H * W * C * (2 if dt == jnp.bfloat16
                                                  else 4)
        rows.append((label, best * 1e3, bytes_ideal / best / 1e9))
        total += best
    for label, ms, gbps in rows:
        print('  {:9s} {:8.2f} ms  {:7.1f} GB/s-ideal'.format(
            label, ms, gbps))
    print('{:12s} total {:8.2f} ms (fwd+bwd, 5 shapes)'.format(
        impl, total * 1e3))


if __name__ == '__main__':
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_tpu_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    for impl in (sys.argv[1:] or ['depthwin2d', 'shifts']):
        try:
            bench_impl(impl)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0] if str(e) else repr(e)
            print('{:12s} FAILED: {}'.format(impl, msg[:160]), flush=True)
