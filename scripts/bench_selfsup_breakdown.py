"""A/B + breakdown of the selfsup_kitti train step on the real chip.

Times the full train step under each warp backend (WARP_IMPL 'auto' =
Pallas matmul-gather with in-graph fallback, 'xla' = packed-tap gather),
and optionally ablations (no-automask, no-supervised) to localize cost.

Usage: python scripts/bench_selfsup_breakdown.py [auto|xla] ...
"""

import sys
import time

import numpy as np


def run(impl, ablate=None, trace_dir=None):
    import jax
    from packnet_sfm_tpu.ops import image as image_ops
    image_ops.WARP_IMPL = impl
    from packnet_sfm_tpu.networks.layers import san
    if ablate == 'sanauto':    # opt-in: Pallas block-sparse SAN convs
        san.SAN_CONV_IMPL = 'auto'
        ablate = None
    elif ablate == 'sanxla':
        san.SAN_CONV_IMPL = 'xla'
        ablate = None

    import bench
    cfg = bench._base_cfg()
    cfg.model.depth_net.use_film = True
    cfg.model.pose_net.name = 'PoseNet'
    cfg.model.loss.supervised_method = 'sparse-ssi-silog'
    cfg.model.loss.supervised_loss_weight = 0.9
    cfg.model.loss.automask_loss = True
    cfg.model.loss.photometric_reduce_op = 'min'
    cfg.tpu.photometric_dtype = 'bfloat16'
    if ablate == 'no_automask':
        cfg.model.loss.automask_loss = False
    if ablate == 'no_sup':
        cfg.model.loss.supervised_loss_weight = 0.0

    rng = np.random.RandomState(0)
    B, H, W = 8, 192, 640
    batch = bench._rand_batch(rng, B, H, W, lidar=True, contexts=2)

    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.mesh import (
        make_mesh, shard_batch, replicate_state)
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)

    model = setup_model(cfg)
    mesh = make_mesh()
    dev_batch = shard_batch(batch, mesh)
    # clip_grad MUST match bench.py's (cfg.arch.clip_grad): a different
    # optimizer chain is a different HLO -> persistent-cache MISS -> ~10
    # min cold compile per impl through the tunnel for numbers that are
    # supposed to A/B against the bench lines
    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                               steps_per_epoch=100,
                               clip_grad=cfg.arch.clip_grad)
    state = init_state(model, optimizer, dev_batch, jax.random.PRNGKey(0))
    state = replicate_state(state, mesh)
    step = make_train_step(model, optimizer, mesh=mesh, donate=True)

    sec, times = bench._bench_step(step, state, dev_batch,
                                   jax.random.PRNGKey(1), windows=4, iters=10)
    tag = impl + (':' + ablate if ablate else '')
    print('{:24s} {:7.1f} ms/step  {:6.1f} img/s  windows: {}'.format(
        tag, sec * 1e3, B / sec,
        ' '.join('{:.1f}'.format(t * 1e3) for t in times)))
    if trace_dir:
        # Device profile of 3 steps of THIS warmed step (profile_step.py's
        # standalone build wedges in init through the tunnel; this path is
        # the one the bench provably runs)
        with jax.profiler.trace(trace_dir):
            st = state
            for i in range(3):
                st, m = step(st, dev_batch, jax.random.fold_in(
                    jax.random.PRNGKey(7), i), 0.0)
            float(m['loss'])
        from profile_step import parse_trace
        parse_trace(trace_dir, steps=3)
    return sec


def probe_viol_on_chip():
    """Evaluate warp_plan's violation flag ON THE CHIP for the exact bench
    selfsup forward (the CPU probe measured y-span exactly AT the band
    limit — on-chip numerics may tip it over, silently falling 'auto' back
    to the XLA branch every step)."""
    import jax
    import jax.numpy as jnp
    import packnet_sfm_tpu.geometry.camera_utils as cu
    from packnet_sfm_tpu.ops.pallas.warp import warp_plan

    flags = []
    real = cu.grid_sample

    def probed(image, grid, padding_mode='zeros'):
        _, viol = warp_plan(image.shape, grid, padding_mode)
        flags.append(viol)
        return real(image, grid, padding_mode)

    cu.grid_sample = probed
    try:
        import bench
        cfg = bench._base_cfg()
        cfg.model.depth_net.use_film = True
        cfg.model.pose_net.name = 'PoseNet'
        cfg.model.loss.supervised_method = 'sparse-ssi-silog'
        cfg.model.loss.supervised_loss_weight = 0.9
        cfg.model.loss.automask_loss = True
        cfg.model.loss.photometric_reduce_op = 'min'
        cfg.tpu.photometric_dtype = 'bfloat16'
        rng = np.random.RandomState(0)
        batch = bench._rand_batch(rng, 8, 192, 640, lidar=True, contexts=2)
        from packnet_sfm_tpu.models import setup_model
        model = setup_model(cfg)
        batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'flip': jax.random.PRNGKey(1)},
                               batch_j, train=True)

        def fwd_flags(v, b):
            # the probe appends per-warp viol TRACERS during tracing;
            # returning them makes them jit outputs fetched in one shot
            # (an eager forward would pay one tunnel RTT per op)
            flags.clear()
            model.apply(v, b, train=True,
                        rngs={'flip': jax.random.PRNGKey(2)},
                        mutable=['batch_stats'])
            return tuple(flags)

        res = jax.jit(fwd_flags)(variables, batch_j)
        print('on-chip violation flags: {}'.format(
            [bool(f) for f in res]), flush=True)
    finally:
        cu.grid_sample = real


if __name__ == '__main__':
    import jax
    import os
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_tpu_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    modes = sys.argv[1:] or ['xla', 'auto']
    for m in modes:
        if m == 'probe_viol':
            probe_viol_on_chip()
            continue
        trace_dir = None
        if m.endswith('+trace'):
            m = m[:-len('+trace')]
            trace_dir = '/tmp/jaxtrace_bd_' + m.replace(':', '_')
        if ':' in m:
            impl, ab = m.split(':', 1)
            run(impl, ab, trace_dir)
        else:
            run(m, trace_dir=trace_dir)
