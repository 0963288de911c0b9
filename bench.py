"""
Benchmark: training throughput (images/sec/chip) of the flagship
ResNetSAN01-18 SemiSupCompletionModel at KITTI resolution 192x640.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference's RTX 3090 FP32 inference number is
120 FPS at 640x384; the training north star is >= 2x A100-PyTorch
images/sec/chip at 192x640. A100 PyTorch training throughput for
monodepth2-style ResNet18 semi-sup stacks is ~55 img/s (bs 8, fp32)
— we report vs_baseline against 2x that (110 img/s).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp

    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)

    B, H, W = 8, 192, 640

    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupCompletionModel'
    cfg.model.depth_net.name = 'ResNetSAN01'
    cfg.model.depth_net.version = '18A'
    cfg.model.depth_net.use_film = True
    cfg.model.pose_net.name = ''
    cfg.model.params.min_depth = 0.5
    cfg.model.params.max_depth = 80.0
    cfg.model.loss.supervised_method = 'sparse-ssi-silog'
    cfg.model.loss.supervised_loss_weight = 1.0
    cfg.tpu.compute_dtype = 'bfloat16'

    rng = np.random.RandomState(0)
    batch = {
        'rgb': rng.rand(B, H, W, 3).astype(np.float32),
        'depth': ((rng.rand(B, H, W, 1) * 70 + 1) *
                  (rng.rand(B, H, W, 1) < 0.2)).astype(np.float32),
        'input_depth': ((rng.rand(B, H, W, 1) * 70 + 1) *
                        (rng.rand(B, H, W, 1) < 0.05)).astype(np.float32),
        'intrinsics': np.tile(np.array(
            [[721.5, 0, W / 2], [0, 721.5, H / 2], [0, 0, 1]],
            np.float32)[None], (B, 1, 1)),
    }

    model = setup_model(cfg)
    mesh = make_mesh()
    n_chips = len(jax.devices())
    dev_batch = shard_batch(batch, mesh)

    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                               steps_per_epoch=100,
                               clip_grad=cfg.arch.clip_grad)
    state = init_state(model, optimizer, dev_batch, jax.random.PRNGKey(0))
    state = replicate_state(state, mesh)
    step = make_train_step(model, optimizer, mesh=mesh, donate=True)

    key = jax.random.PRNGKey(1)
    # warmup + compile
    for i in range(5):
        state, metrics = step(state, dev_batch, jax.random.fold_in(key, i), 0.0)
    jax.block_until_ready(metrics['loss'])

    iters = 40
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, dev_batch,
                              jax.random.fold_in(key, 100 + i), 0.0)
    jax.block_until_ready(metrics['loss'])
    dt = time.perf_counter() - t0

    img_per_sec = B * iters / dt
    per_chip = img_per_sec / n_chips
    baseline = 110.0  # 2x A100-PyTorch target (BASELINE.md north star)
    print(json.dumps({
        'metric': 'train_images_per_sec_per_chip_192x640_resnetsan01',
        'value': round(per_chip, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(per_chip / baseline, 3),
    }))


if __name__ == '__main__':
    sys.exit(main())
