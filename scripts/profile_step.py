"""Device profile of a bench workload via jax.profiler (works through the
axon tunnel — BENCH_NOTES round-2 'Supervised-step device profile').

Traces 3 steps, parses the trace.json.gz device tracks, prints per-op-name
totals and a coarse class rollup. Usage:

    python scripts/profile_step.py [selfsup|supervised] [out_table.txt]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(workload):
    import jax
    import bench
    cfg = bench._base_cfg()
    cfg.model.depth_net.use_film = True
    cfg.model.loss.supervised_method = 'sparse-ssi-silog'
    if workload == 'selfsup':
        cfg.model.pose_net.name = 'PoseNet'
        cfg.model.loss.supervised_loss_weight = 0.9
        cfg.model.loss.automask_loss = True
        cfg.model.loss.photometric_reduce_op = 'min'
        cfg.tpu.photometric_dtype = 'bfloat16'
        contexts = 2
    else:
        cfg.model.pose_net.name = ''
        cfg.model.loss.supervised_loss_weight = 1.0
        contexts = 0
    rng = np.random.RandomState(0)
    B, H, W = 8, 192, 640
    batch = bench._rand_batch(rng, B, H, W, lidar=True, contexts=contexts)

    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.mesh import (
        make_mesh, shard_batch, replicate_state)
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)
    model = setup_model(cfg)
    mesh = make_mesh()
    dev = shard_batch(batch, mesh)
    # clip_grad must match bench.py's optimizer chain or the persistent
    # compile cache misses (same lesson as bench_selfsup_breakdown.py)
    opt = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                         steps_per_epoch=100, clip_grad=cfg.arch.clip_grad)
    state = init_state(model, opt, dev, jax.random.PRNGKey(0))
    state = replicate_state(state, mesh)
    step = make_train_step(model, opt, mesh=mesh, donate=True)
    return step, state, dev


def classify(name):
    n = name.lower()
    for key in ('multiply_reduce_fusion', 'convolution_add_fusion',
                'select_and_scatter', 'all_reduce', 'copy', 'transpose',
                'gather', 'scatter', 'custom_call', 'convolution',
                'reduce_window', 'dynamic_slice', 'dynamic_update'):
        if key in n:
            return key
    if n.startswith('fusion'):
        return 'fusion'
    return 'other'


def main():
    workload = sys.argv[1] if len(sys.argv) > 1 else 'selfsup'
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_tpu_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    step, state, dev = build(workload)
    key = jax.random.PRNGKey(1)
    for i in range(4):
        state, m = step(state, dev, jax.random.fold_in(key, i), 0.0)
    float(m['loss'])
    tdir = '/tmp/jaxtrace_{}'.format(workload)
    with jax.profiler.trace(tdir):
        for i in range(3):
            state, m = step(state, dev, jax.random.fold_in(key, 10 + i), 0.0)
        float(m['loss'])
    print('trace done')

    parse_trace(tdir, steps=3)


def parse_trace(tdir, steps=3, top=25):
    """Aggregate the newest trace under `tdir` into per-op / per-class
    device-time tables (ms per step)."""
    trace = sorted(glob.glob(tdir + '/plugins/profile/*/*.trace.json.gz'))[-1]
    data = json.load(gzip.open(trace))
    events = data['traceEvents']
    # device tracks: process named like '/device:TPU:0' / 'TPU:0'
    devpids = {e['pid'] for e in events
               if e.get('ph') == 'M' and e.get('name') == 'process_name'
               and 'TPU' in str(e.get('args', {}).get('name', ''))
               and 'pjrt' not in str(e.get('args', {}).get('name', ''))}
    per_op = defaultdict(float)
    count = defaultdict(int)
    for e in events:
        if (e.get('ph') == 'X' and e.get('pid') in devpids
                and 'dur' in e):
            per_op[e['name']] += e['dur'] / 1e3 / steps   # ms/step
            count[e['name']] += 1
    rollup = defaultdict(float)
    for name, ms in per_op.items():
        rollup[classify(name)] += ms
    total = sum(per_op.values())
    print('\n== per-step device time: {:.1f} ms =='.format(total))
    for cls, ms in sorted(rollup.items(), key=lambda kv: -kv[1]):
        print('{:28s} {:7.2f} ms  {:4.1f}%'.format(cls, ms, 100 * ms / total))
    print('\n== top {} ops =='.format(top))
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print('{:7.2f} ms  x{:<3d} {}'.format(ms, count[name] // steps,
                                              name[:90]))


if __name__ == '__main__':
    main()
