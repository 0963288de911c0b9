"""Microbench: block-sparse masked conv kernel vs XLA dense conv, at the
SAN stack's real shapes (ResNet18 SAN, bs8 192x640 input), with the
KITTI-like row-structured mask (empty above the horizon).

Usage: python scripts/bench_san_conv.py [fwd|fwdbwd]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [
    # (tag, B, H, W, Cin, Cout, k) — the dominant SAN convs per scale
    ('s0 128->128 5x5', 8, 96, 320, 128, 128, 5),
    ('s0 128->64  5x5', 8, 96, 320, 128, 64, 5),
    ('s1 128->128 5x5', 8, 48, 160, 128, 128, 5),
    ('s2 256->256 3x3', 8, 24, 80, 256, 256, 3),
]


def row_mask(rng, B, H, W):
    m = np.zeros((B, H, W, 1), np.float32)
    h0 = int(H * 0.4)
    m[:, h0:] = (rng.rand(B, H - h0, W, 1) < 0.5).astype(np.float32)
    return m


def bench(op, args, reps=64):
    """Per-op time via IN-GRAPH repetition (lax.scan), subtracting the
    1-rep execution as the fixed dispatch cost. Standalone executions
    through the axon tunnel carry a ~200 ms fixed overhead (measured,
    /tmp probe round 3) that would swamp ms-scale ops; in-graph scan
    amortizes it away. The scan body perturbs the input per-iteration so
    nothing is CSE'd or hoisted."""
    import jax
    import jax.numpy as jnp

    def make(n):
        def fn(*a):
            x = a[0]

            def body(acc, i):
                y = op(x * (1.0 + i * 1e-6).astype(x.dtype), *a[1:])
                return acc + y.astype(jnp.float32).mean(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(n, dtype=jnp.float32))
            return acc
        return jax.jit(fn)

    def run(fn):
        float(np.asarray(fn(*args)))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        return time.perf_counter() - t0

    t1 = run(make(1))
    tn = run(make(reps))
    return (tn - t1) / (reps - 1)


def main():
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.ops.pallas.san_conv import (
        masked_conv2d, masked_conv2d_pallas, tile_activity)

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_tpu_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    mode = sys.argv[1] if len(sys.argv) > 1 else 'fwd'
    rng = np.random.RandomState(0)

    for tag, B, H, W, Cin, Cout, k in SHAPES:
        mask = jnp.asarray(row_mask(rng, B, H, W))
        x = (jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
             * mask).astype(jnp.bfloat16)
        kern = jnp.asarray(rng.randn(k, k, Cin, Cout).astype(np.float32)
                           * 0.05).astype(jnp.bfloat16)
        bias = jnp.zeros((Cout,), jnp.bfloat16)
        flags = tile_activity(mask, k)
        frac = float(jnp.mean(flags.astype(jnp.float32)))

        if mode == 'fwd':
            def xla(x_, k_, b_):
                return jax.lax.conv_general_dilated(
                    x_, k_, (1, 1), 'SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC')
                ) * mask.astype(x_.dtype)

            def pal(x_, k_, b_):
                return masked_conv2d_pallas(x_, mask, k_, b_, flags)
        else:
            # quadratic loss: BOTH dx and dW depend on the (per-rep
            # perturbed) input, so nothing hoists out of the scan
            def loss_x(x_, k_, b_):
                y = jax.lax.conv_general_dilated(
                    x_, k_, (1, 1), 'SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                y = (y + b_) * mask.astype(y.dtype)
                return 0.5 * jnp.sum(y.astype(jnp.float32) ** 2)

            def loss_p(x_, k_, b_):
                y = masked_conv2d(x_, mask, k_, b_, flags, False)
                return 0.5 * jnp.sum(y.astype(jnp.float32) ** 2)

            def xla(x_, k_, b_):
                dx, dk = jax.grad(loss_x, argnums=(0, 1))(x_, k_, b_)
                return (dx.astype(jnp.float32).mean()
                        + dk.astype(jnp.float32).mean())

            def pal(x_, k_, b_):
                dx, dk = jax.grad(loss_p, argnums=(0, 1))(x_, k_, b_)
                return (dx.astype(jnp.float32).mean()
                        + dk.astype(jnp.float32).mean())
        t_x = bench(xla, (x, kern, bias))
        t_p = bench(pal, (x, kern, bias))
        print('{:18s} active {:3.0f}%  xla {:7.3f} ms  pallas {:7.3f} ms '
              '({:4.2f}x)'.format(tag, frac * 100, t_x * 1e3, t_p * 1e3,
                                  t_x / t_p))


if __name__ == '__main__':
    main()
