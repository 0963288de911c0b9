"""Isolated warp A/B at the REAL in-step shape of the selfsup workload:
one fused multi-scale warp per context — source [8,192,640,3] bf16,
grid [8,768,640,2] (4 full-res scales row-concatenated,
losses/photometric.py fuse_scales path).

Times, via in-graph lax.scan repetition (fixed ~200 ms tunnel dispatch
amortized away, same methodology as bench_san_conv.py):
  - fwd:    grid_sample forward under each backend
  - fwdbwd: d/d(grid) of a scalar of the warped image (the training
            direction — image cotangent is unused in the losses)

Usage: python scripts/bench_warp_isolated.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_grid(rng, B, Ho, Wo, H, W, max_disp=24.0):
    """SfM-like smooth flow: identity + smooth per-scale displacement
    (bounded so the Pallas band accepts it, like a near-identity pose)."""
    ys, xs = np.meshgrid(np.arange(Ho) % H, np.arange(Wo), indexing='ij')
    gx = xs / (W - 1) * 2 - 1
    gy = ys / (H - 1) * 2 - 1
    dx = (rng.rand(B, 1, 1) * 2 - 1) * max_disp / (W - 1) * 2
    dy = (rng.rand(B, 1, 1) * 2 - 1) * (max_disp / 2) / (H - 1) * 2
    grid = np.stack(
        [np.broadcast_to(gx, (B, Ho, Wo)) + dx,
         np.broadcast_to(gy, (B, Ho, Wo)) + dy], axis=-1)
    return grid.astype(np.float32)


def bench(fn, args, reps):
    import jax
    import jax.numpy as jnp

    def body(c, _):
        out = fn(*args[:-1], args[-1] + c * 1e-6)
        return c + 1.0, jnp.float32(out.ravel()[0] if hasattr(out, 'ravel')
                                    else out)

    @jax.jit
    def run():
        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return outs[-1]

    @jax.jit
    def run1():
        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=1)
        return outs[-1]

    float(run1())
    float(run())
    t0 = time.perf_counter()
    float(run1())
    t1 = time.perf_counter()
    float(run())
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (reps - 1)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.ops import image as image_ops

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_tpu_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    B, H, W, S = 8, 192, 640, 4
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3), jnp.bfloat16)
    grid = jnp.asarray(make_grid(rng, B, S * H, W, H, W))
    print('backend:', jax.default_backend(), ' src', img.shape,
          'grid', grid.shape, flush=True)

    def fwd(im, g):
        return image_ops.grid_sample(im, g).astype(jnp.float32).mean()

    def fwdbwd(im, g):
        return jax.grad(lambda gg: fwd(im, gg))(g).astype(
            jnp.float32).mean()

    for impl in ('xla', 'auto', 'force'):
        image_ops.WARP_IMPL = impl
        if impl == 'force':
            os.environ['PACKNET_WARP_FORCE_OK'] = '1'
        for tag, f in (('fwd', fwd), ('fwdbwd', fwdbwd)):
            sec = bench(lambda im, g: f(im, g), (img, grid), reps)
            print('{:6s} {:7s} {:8.2f} ms/warp'.format(
                impl, tag, sec * 1e3), flush=True)


if __name__ == '__main__':
    main()
