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
    if workload.startswith('packnet01'):
        # the bench packnet01 A/B workload (upstream headline encoder)
        _, _, impl = workload.partition(':')
        if impl:
            from packnet_sfm_tpu.networks.layers import packnet as pn
            impl, _, suffix = impl.partition('+')
            pn.CONV3D_IMPL = impl
            pn.PACK_FUSED = suffix == 'fused'
        cfg.model.depth_net.name = 'PackNet01'
        cfg.model.depth_net.version = '1A'
        cfg.model.pose_net.name = ''
        cfg.model.loss.supervised_method = 'sparse-l1'
        cfg.model.loss.supervised_loss_weight = 1.0
        rng = np.random.RandomState(0)
        batch = bench._rand_batch(rng, 8, 192, 640, lidar=False, contexts=0)
        return _finish(cfg, batch)
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
    return _finish(cfg, batch)


def _finish(cfg, batch):
    import jax
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
    """Aggregate the newest trace under `tdir` into per-op tables
    (ms per step) on the 'XLA Ops' device track, with the profiler's own
    hlo_category / model_flops / bytes_accessed so each op shows its
    achieved TF/s and GB/s and its top repo source line."""
    trace = sorted(glob.glob(tdir + '/plugins/profile/*/*.trace.json.gz'))[-1]
    data = json.load(gzip.open(trace))
    events = data['traceEvents']
    devpids = {e['pid'] for e in events
               if e.get('ph') == 'M' and e.get('name') == 'process_name'
               and 'TPU' in str(e.get('args', {}).get('name', ''))
               and 'pjrt' not in str(e.get('args', {}).get('name', ''))}
    optids = {(e['pid'], e.get('tid')) for e in events
              if e.get('ph') == 'M' and e.get('name') == 'thread_name'
              and e['pid'] in devpids
              and e.get('args', {}).get('name') == 'XLA Ops'}
    per_op = defaultdict(lambda: [0.0, 0, 0.0, 0.0, '', ''])
    for e in events:
        if (e.get('ph') == 'X' and (e.get('pid'), e.get('tid')) in optids
                and 'dur' in e):
            a = e.get('args', {})
            r = per_op[e['name']]
            r[0] += e['dur'] / 1e3 / steps   # ms/step
            r[1] += 1
            r[2] += float(a.get('model_flops', 0) or 0) / steps
            r[3] += float(a.get('bytes_accessed', 0) or 0) / steps
            r[4] = a.get('hlo_category', '')
            if not r[5]:
                for ln in str(a.get('source_stack', '')).split('\n'):
                    if '/root/repo' in ln and 'flax' not in ln:
                        r[5] = ln.split('/')[-1]
                        break
    rollup = defaultdict(lambda: [0.0, 0.0])
    for name, r in per_op.items():
        rollup[r[4] or classify(name)][0] += r[0]
        rollup[r[4] or classify(name)][1] += r[2]
    total = sum(r[0] for r in per_op.values())
    print('\n== per-step device time: {:.1f} ms =='.format(total))
    for cls, (ms, fl) in sorted(rollup.items(), key=lambda kv: -kv[1][0]):
        print('{:28s} {:7.2f} ms  {:4.1f}%  {:7.1f} GF'.format(
            cls, ms, 100 * ms / total, fl / 1e9))
    print('\n== top {} ops =='.format(top))
    for name, r in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]:
        ms, n, fl, by, cat, src = r
        print('{:7.2f} ms x{:<2d} {:5.1f} TF/s {:6.1f} GB/s {:18s} {:28s} {}'
              .format(ms, n // steps, fl / ms / 1e9 if ms else 0,
                      by / ms / 1e6 if ms else 0, cat[:18], name[:28], src))


if __name__ == '__main__':
    main()
