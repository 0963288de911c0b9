"""Microbenchmark: Mosaic dynamic_gather (jnp.take_along_axis inside Pallas)
semantics and throughput on TPU — the primitive the Pallas warp kernel
(ops/pallas/warp.py) is built on.

Questions answered (results recorded in BENCH_NOTES.md):
1. does a same-shape 2D lane-gather (axis=1) lower for [8,128] blocks?
2. do indices >= 128 work on wider blocks ([8,256]/[8,640]) or is the
   gather per-128-lane-chunk only?
3. throughput: vreg-gathers/second in a realistic unrolled loop.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def lane_gather(x, idx):
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def check_semantics(S, L):
    rng = np.random.RandomState(0)
    x = rng.randn(S, L).astype(np.float32)
    idx = rng.randint(0, L, size=(S, L)).astype(np.int32)
    try:
        got = np.asarray(lane_gather(jnp.asarray(x), jnp.asarray(idx)))
    except Exception as e:
        print(f'[{S}x{L}] FAILS: {type(e).__name__}: {str(e)[:200]}')
        return False
    want = np.take_along_axis(x, idx, axis=1)
    ok = np.array_equal(got, want)
    if not ok:
        # maybe per-128 chunk semantics: idx interpreted mod 128 in-chunk?
        chunks = []
        for c in range(L // 128):
            xc = x[:, c * 128:(c + 1) * 128]
            ic = idx[:, c * 128:(c + 1) * 128] % 128
            chunks.append(np.take_along_axis(xc, ic, axis=1))
        alt = np.concatenate(chunks, axis=1)
        alt_ok = np.array_equal(got, alt)
        print(f'[{S}x{L}] lowers but WRONG vs global take_along_axis; '
              f'per-128-chunk-mod semantics match: {alt_ok}')
        return False
    print(f'[{S}x{L}] OK (global indices correct)')
    return True


def _loop_kernel(n_gathers, x_ref, idx_ref, o_ref):
    acc = jnp.zeros_like(x_ref[:, :128])
    for i in range(n_gathers):
        g = jnp.take_along_axis(
            x_ref[:, (i % 4) * 128:(i % 4 + 1) * 128],
            idx_ref[:, (i % 4) * 128:(i % 4 + 1) * 128], axis=1)
        acc = acc + g
    o_ref[:] = acc


def bench_throughput(S=8, n_gathers=512, iters=50):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(S, 512).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 128, size=(S, 512)).astype(np.int32))
    f = jax.jit(lambda x, i: pl.pallas_call(
        functools.partial(_loop_kernel, n_gathers),
        out_shape=jax.ShapeDtypeStruct((S, 128), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))
    out = f(x, idx)
    float(out.sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x, idx)
    float(out.sum())
    dt = (time.perf_counter() - t0) / iters
    total_idx = n_gathers * S * 128
    print(f'loop kernel [{S}x128 vreg-gathers x{n_gathers}]: {dt*1e6:.1f} us/call '
          f'-> {dt/n_gathers*1e9:.1f} ns/gather-op, '
          f'{dt/total_idx*1e9:.3f} ns/idx (excl. dispatch)')


if __name__ == '__main__':
    print('devices:', jax.devices())
    ok128 = check_semantics(8, 128)
    check_semantics(8, 256)
    check_semantics(8, 640)
    check_semantics(16, 128)
    check_semantics(32, 128)
    if ok128:
        bench_throughput(S=8, n_gathers=512)
        bench_throughput(S=32, n_gathers=512)
    sys.exit(0)
