"""bf16-vs-fp32 photometric convergence A/B (VERDICT round-2 task 6).

Overfits the self-supervised step on ONE synthetic batch for N steps under
each tpu.photometric_dtype and prints the final photometric loss. Round-2
state: fp32 0.090, bf16-centered 0.122 (BENCH_NOTES precision table); the
round-3 fp32-moment-island SSIM (ops/ssim.py) is expected to close the gap
while keeping the pixel tensors half-width.

Usage: python scripts/bench_bf16_convergence.py [steps] [BxHxW]
       (default 40 steps, 2x96x320 — CPU-runnable; use 8x192x640 on TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(dtype_name, steps, B, H, W):
    import jax
    import bench
    cfg = bench._base_cfg()
    cfg.model.depth_net.use_film = True
    cfg.model.pose_net.name = 'PoseNet'
    cfg.model.loss.supervised_method = 'sparse-ssi-silog'
    cfg.model.loss.supervised_loss_weight = 0.0  # isolate the photometric path
    cfg.model.loss.automask_loss = True
    cfg.model.loss.photometric_reduce_op = 'min'
    cfg.tpu.photometric_dtype = dtype_name

    # structured synthetic scenes (textured + consistent ego-motion): the
    # photometric loss can actually overfit these, unlike iid noise
    from packnet_sfm_tpu.datasets.synthetic import SyntheticDataset
    ds = SyntheticDataset(num_samples=B, height=H, width=W,
                          with_input_depth=True, seed=0)
    samples = [ds[i] for i in range(B)]

    def stack(key):
        return np.stack([s[key] for s in samples])
    batch = {
        'rgb': stack('rgb'),
        'rgb_original': stack('rgb_original'),
        'depth': stack('depth'),
        'input_depth': stack('input_depth'),
        'intrinsics': stack('intrinsics'),
        'rgb_context': [
            np.stack([s['rgb_context'][c] for s in samples])
            for c in range(len(samples[0]['rgb_context']))],
        'rgb_context_original': [
            np.stack([s['rgb_context_original'][c] for s in samples])
            for c in range(len(samples[0]['rgb_context']))],
    }

    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.mesh import (
        make_mesh, shard_batch, replicate_state)
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)

    model = setup_model(cfg)
    mesh = make_mesh()
    dev_batch = shard_batch(batch, mesh)
    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                               steps_per_epoch=steps, clip_grad=0.0)
    state = init_state(model, optimizer, dev_batch, jax.random.PRNGKey(0))
    state = replicate_state(state, mesh)
    step = make_train_step(model, optimizer, mesh=mesh, donate=True)

    t0 = time.time()
    loss = float('nan')
    key = jax.random.PRNGKey(1)
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, dev_batch, sub, 0.0)
        if i in (0, steps // 2, steps - 1):
            loss = float(metrics['photometric_loss'])
            print('  [{}] step {:3d}: photometric {:.4f}'.format(
                dtype_name, i, loss))
    print('{}: final photometric {:.4f}  ({:.1f}s)'.format(
        dtype_name, loss, time.time() - t0))
    return loss


if __name__ == '__main__':
    if os.environ.get('FORCE_CPU'):
        from packnet_sfm_tpu.utils.hostjax import force_cpu
        force_cpu()
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_tpu_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    if len(sys.argv) > 2:
        B, H, W = (int(v) for v in sys.argv[2].split('x'))
    else:
        B, H, W = 2, 96, 320
    f32 = run('float32', steps, B, H, W)
    bf16 = run('bfloat16', steps, B, H, W)
    print('fp32 {:.4f} vs bf16 {:.4f} (gap {:+.4f})'.format(
        f32, bf16, bf16 - f32))
