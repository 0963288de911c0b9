"""
A/B benchmark: generic-camera softmax patch projection backends
(dense [B,HW,K,3] gather vs streaming online-softmax scan vs the Pallas
VMEM-resident kernel, ops/pallas/generic_projection.py) at the reference's
patch_side=20 (K=1681).

The dense path is what the reference computes (half-res only — full-res
would need ~2.5 GB of patch tensor per image); the kernel targets both.

Usage: python scripts/bench_generic_projection.py [--iters 20] [--batch 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def _sync(out):
    """Force real completion by fetching a value — block_until_ready can
    return early on this backend (see bench.py module docstring)."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def bench(fn, args, iters, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--patch_side', type=int, default=20)
    ap.add_argument('--grad', action='store_true',
                    help='also time fwd+bwd (training path)')
    a = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_tpu_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp
    from packnet_sfm_tpu.geometry.camera_generic import (
        GenericCamera, pinhole_ray_surface)

    print('backend:', jax.default_backend(), jax.devices()[0])
    rng = np.random.RandomState(0)

    for (H, W), label in (((96, 320), 'half-res 192x640'),
                          ((192, 640), 'FULL-res 192x640')):
        K = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32)
        K = jnp.asarray(np.tile(K[None], (a.batch, 1, 1)))
        rays = pinhole_ray_surface(K, H, W)
        rays = rays + jnp.asarray(
            rng.randn(a.batch, H, W, 3).astype(np.float32)) * 0.02
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        depth = jnp.asarray(
            (rng.rand(a.batch, H, W, 1) * 10 + 1).astype(np.float32))
        cam = GenericCamera.create(rays, patch_side=a.patch_side)
        pts = cam.reconstruct(depth, frame='c')

        dense_bytes = a.batch * H * W * (2 * a.patch_side + 1) ** 2 * 3 * 4
        print('\n== {} (B={}, patch K={}, dense patch tensor {:.2f} GB)'
              .format(label, a.batch, (2 * a.patch_side + 1) ** 2,
                      dense_bytes / 2**30))
        results = {}
        for backend in ('dense', 'streaming', 'pallas'):
            fn = jax.jit(lambda X, be=backend: cam.project(
                X, progress=0.5, downsample=False, backend=be))
            try:
                ms = bench(fn, (pts,), a.iters)
                results[backend] = ms
                print('  {:<10} fwd {:8.2f} ms'.format(backend, ms))
            except Exception as e:  # OOM on dense full-res is expected
                print('  {:<10} FAILED: {}'.format(
                    backend, str(e).splitlines()[0][:100]))
            if a.grad and backend in results:
                g = jax.jit(jax.grad(lambda r, be=backend: jnp.sum(
                    GenericCamera.create(r, patch_side=a.patch_side)
                    .project(pts, progress=0.5, downsample=False,
                             backend=be) ** 2)))
                try:
                    ms = bench(g, (rays,), a.iters)
                    print('  {:<10} fwd+bwd {:8.2f} ms'.format(backend, ms))
                except Exception as e:
                    print('  {:<10} grad FAILED: {}'.format(
                        backend, str(e).splitlines()[0][:100]))
        if 'pallas' in results:
            base = results.get('dense', results.get('streaming'))
            if base:
                print('  -> pallas speedup vs best XLA: {:.2f}x'.format(
                    min(v for k, v in results.items() if k != 'pallas')
                    / results['pallas']))


if __name__ == '__main__':
    main()
