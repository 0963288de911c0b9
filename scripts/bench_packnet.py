"""PackNet01 train-step A/B across _Conv3DStack implementations
(VERDICT round-2 task 4 — the packing stack was 39 img/s with depthwin2d;
the depthwise formulation removes the [B,H,W,C,3] window materialization
and the B*C batch relayout).

Usage: python scripts/bench_packnet.py [depthwin2d|depthwise|conv3d ...]
Append '+remat' to an impl to wrap the forward in jax.checkpoint —
the literal conv3d impl OOMed at bs8 in round 2 (18.75G > 15.75G HBM,
activation-bound), which remat trades for ~1.3x FLOPs.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spec, B=8, H=192, W=640):
    import jax
    from packnet_sfm_tpu.networks.layers import packnet as packnet_layers
    impl, _, suffix = spec.partition('+')
    remat = suffix == 'remat'
    packnet_layers.CONV3D_IMPL = impl
    packnet_layers.PACK_FUSED = suffix == 'fused'

    import bench
    cfg = bench._base_cfg()
    cfg.model.depth_net.name = 'PackNet01'
    cfg.model.depth_net.version = '1A'
    cfg.model.pose_net.name = ''
    cfg.model.loss.supervised_method = 'sparse-l1'
    cfg.model.loss.supervised_loss_weight = 1.0

    rng = np.random.RandomState(0)
    batch = bench._rand_batch(rng, B, H, W, lidar=False, contexts=0)

    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.mesh import (
        make_mesh, shard_batch, replicate_state)
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)
    model = setup_model(cfg)
    mesh = make_mesh()
    dev = shard_batch(batch, mesh)
    opt = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                         steps_per_epoch=100, clip_grad=0.0)
    state = init_state(model, opt, dev, jax.random.PRNGKey(0))
    state = replicate_state(state, mesh)
    step = make_train_step(model, opt, mesh=mesh, donate=True, remat=remat)
    sec, times = bench._bench_step(step, state, dev, jax.random.PRNGKey(1),
                                   windows=4, iters=8)
    print('{:16s} {:7.1f} ms/step  {:6.1f} img/s  windows: {}'.format(
        spec, sec * 1e3, B / sec,
        ' '.join('{:.1f}'.format(t * 1e3) for t in times)))


if __name__ == '__main__':
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_tpu_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    for spec in (sys.argv[1:] or ['depthwin2d', 'depthwise',
                                  'conv3d+remat']):
        # one impl failing (e.g. depthwise's grouped-conv BACKWARD OOMs at
        # compile: XLA materializes bf16[8,96,320,8,256] per-group windows
        # padded 16x to 15G — artifacts/bench_r5/packnet_ab.err) must not
        # cost the other impls' numbers
        try:
            run(spec)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0] if str(e) else repr(e)
            print('{:16s} FAILED: {}'.format(spec, msg[:200]), flush=True)
