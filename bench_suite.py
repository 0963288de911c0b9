"""
Extended benchmark suite (bench.py stays the driver's single-line bench).

Measures on the real TPU:
1. supervised-only completion train step (bench.py config)
2. self-sup + supervised (photometric warp + SSIM + automask) train step
3. eval forward FPS at 640x384 (reference inference headline: 120 FPS FP32
   on RTX 3090, BASELINE.md)

Usage: python bench_suite.py [--iters N]
"""

import argparse
import json
import time

import numpy as np


def make_batch(B, H, W, rng, contexts=0, lidar=True):
    batch = {
        'rgb': rng.rand(B, H, W, 3).astype(np.float32),
        'depth': ((rng.rand(B, H, W, 1) * 70 + 1) *
                  (rng.rand(B, H, W, 1) < 0.2)).astype(np.float32),
        'intrinsics': np.tile(np.array(
            [[721.5, 0, W / 2], [0, 721.5, H / 2], [0, 0, 1]],
            np.float32)[None], (B, 1, 1)),
    }
    if lidar:
        batch['input_depth'] = ((rng.rand(B, H, W, 1) * 70 + 1) *
                                (rng.rand(B, H, W, 1) < 0.05)
                                ).astype(np.float32)
    if contexts:
        batch['rgb_original'] = batch['rgb'].copy()
        batch['rgb_context'] = [rng.rand(B, H, W, 3).astype(np.float32)
                                for _ in range(contexts)]
        batch['rgb_context_original'] = [c.copy()
                                         for c in batch['rgb_context']]
    return batch


def build(name, selfsup, use_film=True, dtype='bfloat16',
          depth_net='ResNetSAN01', version='18A'):
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.models import setup_model
    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupCompletionModel'
    cfg.model.depth_net.name = depth_net
    cfg.model.depth_net.version = version
    cfg.model.depth_net.use_film = use_film
    cfg.model.pose_net.name = 'PoseNet' if selfsup else ''
    cfg.model.params.min_depth = 0.5
    cfg.model.params.max_depth = 80.0
    cfg.model.loss.supervised_method = 'sparse-ssi-silog'
    cfg.model.loss.supervised_loss_weight = 1.0 if not selfsup else 0.9
    cfg.tpu.compute_dtype = dtype
    return cfg, setup_model(cfg)


def time_train(cfg, model, batch, iters):
    import jax
    from packnet_sfm_tpu.parallel.mesh import (
        make_mesh, shard_batch, replicate_state)
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)
    mesh = make_mesh()
    dev = shard_batch(batch, mesh)
    opt = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 100,
                         clip_grad=cfg.arch.clip_grad)
    state = replicate_state(init_state(model, opt, dev,
                                       jax.random.PRNGKey(0)), mesh)
    step = make_train_step(model, opt, mesh=mesh, donate=True)
    key = jax.random.PRNGKey(1)
    for i in range(3):
        state, m = step(state, dev, jax.random.fold_in(key, i), 0.5)
    # value fetch, NOT block_until_ready: on this backend block_until_ready
    # over donated-execution outputs returns before the program runs
    # (see bench.py module docstring)
    float(m['loss'])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, dev, jax.random.fold_in(key, 99 + i), 0.5)
    float(m['loss'])
    return (time.perf_counter() - t0) / iters


def time_eval(cfg, model, batch, iters):
    import jax
    import jax.numpy as jnp
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'flip': jax.random.PRNGKey(1)},
                           jax.tree_util.tree_map(jnp.asarray, batch),
                           train=True)

    @jax.jit
    def fwd(rgb, d):
        out = model.apply(variables, {'rgb': rgb, 'input_depth': d},
                          train=False)
        return out['inv_depths'][0]

    rgb = jnp.asarray(batch['rgb'])
    d = jnp.asarray(batch['input_depth'])
    out = fwd(rgb, d)
    float(out.ravel()[0])  # value fetch (see time_train note)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(rgb, d)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--iters', type=int, default=20)
    args = parser.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    rng = np.random.RandomState(0)
    results = {}

    # 1. supervised-only train, 192x640 bs8
    cfg, model = build('sup', selfsup=False)
    dt = time_train(cfg, model, make_batch(8, 192, 640, rng), args.iters)
    results['train_sup_img_per_s'] = 8 / dt

    # 2. selfsup+sup train with 2 contexts (photometric path)
    cfg, model = build('selfsup', selfsup=True)
    dt = time_train(cfg, model, make_batch(4, 192, 640, rng, contexts=2),
                    args.iters)
    results['train_selfsup_img_per_s'] = 4 / dt

    # 2b. PackNet family (depthwise CONV3D impl) + slim-SAN FiLM
    cfg, model = build('packnet', selfsup=False,
                       depth_net='PackNet01', version='1A')
    dt = time_train(cfg, model, make_batch(8, 192, 640, rng), args.iters)
    results['train_packnet01_img_per_s'] = 8 / dt
    cfg, model = build('slim_film', selfsup=False,
                       depth_net='PackNetSlimSAN01', version='1A')
    dt = time_train(cfg, model, make_batch(8, 192, 640, rng), args.iters)
    results['train_slim_san_film_img_per_s'] = 8 / dt

    # 3. eval FPS at 640x384 (reference headline resolution), batch 1
    cfg, model = build('eval', selfsup=False)
    dt = time_eval(cfg, model, make_batch(1, 384, 640, rng), args.iters * 3)
    results['eval_fps_384x640_b1'] = 1 / dt
    dt = time_eval(cfg, model, make_batch(8, 384, 640, rng), args.iters)
    results['eval_fps_384x640_b8'] = 8 / dt

    print(json.dumps({k: round(v, 2) for k, v in results.items()}, indent=2))


if __name__ == '__main__':
    main()
