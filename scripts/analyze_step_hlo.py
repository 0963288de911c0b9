"""
Structural HLO analysis of the bench train steps, no TPU required.

Builds the exact bench.py workloads (selfsup_kitti / resnetsan01), lowers
the jitted train step at the real bench shapes on CPU, and aggregates the
optimized HLO: total FLOPs (XLA cost analysis), gather ops (count + total
gathered bytes — TPU gathers are index-bound, this is the selfsup cost
center), convolution FLOPs by shape, and the big reduce/select ops.

The CPU-optimized HLO differs from TPU's in fusion boundaries, but the
op-level structure (how many warp gathers exist, what the conv stack
costs) is backend-independent — this is how we verify a structural
optimization (e.g. the fused per-context multi-scale warp) actually
changed the program without a live tunnel.

Usage:
    python scripts/analyze_step_hlo.py [selfsup_kitti|resnetsan01|both]
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()

import numpy as np  # noqa: E402


def build_workload(name):
    """Reproduce bench.py's model/batch/step for `name` exactly."""
    import jax
    import bench
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)

    B, H, W = 8, 192, 640
    rng = np.random.RandomState(0)
    cfg = bench._base_cfg()
    cfg.model.depth_net.use_film = True
    if name == 'selfsup_kitti':
        cfg.model.pose_net.name = 'PoseNet'
        cfg.model.loss.supervised_method = 'sparse-ssi-silog'
        cfg.model.loss.supervised_loss_weight = 0.9
        cfg.model.loss.automask_loss = True
        cfg.model.loss.photometric_reduce_op = 'min'
        cfg.tpu.photometric_dtype = 'bfloat16'
        batch = bench._rand_batch(rng, B, H, W, lidar=True, contexts=2)
    elif name == 'resnetsan01':
        cfg.model.pose_net.name = ''
        cfg.model.loss.supervised_method = 'sparse-ssi-silog'
        cfg.model.loss.supervised_loss_weight = 1.0
        batch = bench._rand_batch(rng, B, H, W, lidar=True, contexts=0)
    else:
        raise SystemExit('unknown workload ' + name)

    model = setup_model(cfg)
    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                               steps_per_epoch=100, clip_grad=cfg.arch.clip_grad)
    batch = {k: ([jax.numpy.asarray(x) for x in v] if isinstance(v, list)
                 else jax.numpy.asarray(v)) for k, v in batch.items()}
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, None and optimizer or optimizer,
                           mesh=None, donate=False)
    return step, state, batch


_SHAPE_BYTES = {'f32': 4, 'bf16': 2, 's32': 4, 'u32': 4, 'pred': 1,
                'f16': 2, 's8': 1, 'u8': 1, 'f64': 8, 's64': 8, 'u64': 8}


def _nbytes(shape_str):
    """'f32[8,192,640,3]' -> bytes."""
    m = re.match(r'(\w+)\[([\d,]*)\]', shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(','):
        if d:
            n *= int(d)
    return n * _SHAPE_BYTES.get(dt, 4)


def analyze(name):
    import jax
    step, state, batch = build_workload(name)
    print('== {} : lowering + compiling on CPU (minutes-scale) =='.format(
        name), flush=True)
    lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(1), 0.0)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get('flops', float('nan'))
    print('cost_analysis: {:.1f} GFLOP, {:.1f} MB accessed'.format(
        flops / 1e9, ca.get('bytes accessed', 0) / 1e6))

    hlo = compiled.as_text()
    ops = defaultdict(int)
    gather_bytes = 0
    gathers = []
    convs = []
    for line in hlo.splitlines():
        line = line.strip()
        # HLO: '[ROOT ]%name = f32[...]{layout} opname(...)'
        m = re.match(
            r'(?:ROOT )?%?[\w.\-]+ = \(?(\w+\[[\d,]*\][^ ]*) ([\w\-]+)\(',
            line)
        if not m:
            continue
        shape, op = m.group(1), m.group(2)
        ops[op] += 1
        if op == 'gather':
            b = _nbytes(shape)
            gather_bytes += b
            gathers.append((b, shape, line[:160]))
        elif op == 'convolution':
            convs.append((_nbytes(shape), shape))
    print('op counts (top): ' + ', '.join(
        '{}={}'.format(k, v) for k, v in
        sorted(ops.items(), key=lambda kv: -kv[1])[:12]))
    print('GATHERS: {} ops, {:.1f} MB total output'.format(
        len(gathers), gather_bytes / 1e6))
    for b, shape, _ in sorted(gathers, reverse=True)[:12]:
        print('   {:>10.2f} KB  {}'.format(b / 1e3, shape))
    print('CONVOLUTIONS: {} ops'.format(len(convs)))
    big = sorted(convs, reverse=True)[:8]
    for b, shape in big:
        print('   out {:>10.2f} KB  {}'.format(b / 1e3, shape))
    return {'flops': flops, 'gathers': len(gathers),
            'gather_mb': gather_bytes / 1e6}


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    names = ['selfsup_kitti', 'resnetsan01'] if which == 'both' else [which]
    for n in names:
        analyze(n)
