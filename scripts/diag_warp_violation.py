"""Diagnose WHY the Pallas warp kernel wins 8.5x isolated but ~0% in-step.

The in-graph fallback (ops/image.py _warp_value_cond) routes a warp to the
XLA gather path whenever warp_plan's band-violation flag fires. If the
REAL selfsup workload's flows (random-init nets, bench batch) violate the
band, every in-step warp silently pays the 36.5 ms XLA gather instead of
the 4.3 ms kernel — which would exactly explain the flat A/B
(BENCH_NOTES round 4: 62.55 vs 60.68 img/s).

This script rebuilds the exact bench selfsup workload on the HOST CPU,
intercepts every grid_sample call in the loss forward, and reports per
warp: the violation flag, which sub-condition fired, and the margin stats
(per-row y-span, tile tilt, |dx| window residency) — the data needed to
size a band that actually covers SfM flows at init.

Usage: python scripts/diag_warp_violation.py [--steps 2]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from packnet_sfm_tpu.utils.hostjax import force_cpu  # noqa: E402
force_cpu()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPORTS = []


def _plan_stats(image_shape, grid, padding_mode):
    """Re-derive warp_plan's violation conditions with margins kept."""
    from packnet_sfm_tpu.ops.pallas import warp as W
    B, H, Wd, C = image_shape
    gx, gy = grid[..., 0], grid[..., 1]
    x = (gx + 1.0) * 0.5 * (Wd - 1)
    y = (gy + 1.0) * 0.5 * (H - 1)
    if padding_mode == 'border':
        x = jnp.clip(x, 0.0, Wd - 1)
        y = jnp.clip(y, 0.0, H - 1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    Wp, Hp = Wd + 4, H + 4
    wpad = max(-(-Wp // W.LANE) * W.LANE, W.WIN)
    xc = jnp.clip(x0 + 2.0, 0, Wp - 2).astype(jnp.int32)
    yc = jnp.clip(y0 + 2.0, 0, Hp - 2).astype(jnp.int32)
    _, Ho, Wo = xc.shape
    wo_pad = -(-Wo // W.LANE) * W.LANE
    ho_pad = -(-Ho // W.TILE_ROWS) * W.TILE_ROWS
    if (wo_pad, ho_pad) != (Wo, Ho):
        pad = ((0, 0), (0, ho_pad - Ho), (0, wo_pad - Wo))
        xc = jnp.pad(xc, pad, mode='edge')
        yc = jnp.pad(yc, pad, mode='edge')
    n_t = ho_pad // W.TILE_ROWS
    base_r = jnp.minimum(jnp.min(yc, axis=2), Hp - W.BH)
    ylocal = yc - base_r[:, :, None]
    yspan = jnp.max(ylocal, axis=2)                    # per row
    base_rt = base_r.reshape(-1, n_t, W.TILE_ROWS)
    base_t = jnp.minimum(jnp.min(base_rt, axis=2), Hp - W.TILE_BAND)
    rowoff = base_rt - base_t[:, :, None]
    cidx = jnp.arange(wo_pad) // W.LANE
    wstart = jnp.minimum(jnp.maximum(0, (cidx - 1) * W.LANE), wpad - W.WIN)
    xloc = xc - wstart[None, None, :]
    frac_x_out = jnp.mean(((xloc < 0) | (xloc >= W.WIN)).astype(jnp.float32))
    return dict(
        viol_y=jnp.any(ylocal > W.BH - 2),
        viol_tilt=jnp.any(rowoff > W.TILE_BAND - W.BH),
        viol_x=jnp.any((xloc < 0) | (xloc >= W.WIN)),
        yspan_max=jnp.max(yspan),
        yspan_p99=jnp.percentile(yspan.astype(jnp.float32), 99),
        rowoff_max=jnp.max(rowoff),
        frac_rows_y_viol=jnp.mean((yspan > W.BH - 2).astype(jnp.float32)),
        frac_x_out=frac_x_out,
        xloc_min=jnp.min(xloc), xloc_max=jnp.max(xloc),
    )


def install_probe():
    import packnet_sfm_tpu.geometry.camera_utils as cu
    real = cu.grid_sample

    def probed(image, grid, padding_mode='zeros'):
        stats = _plan_stats(image.shape, grid, padding_mode)
        REPORTS.append((image.shape, str(image.dtype), grid.shape,
                        {k: np.asarray(v) for k, v in
                         jax.tree_util.tree_map(
                             jax.lax.stop_gradient, stats).items()}))
        return real(image, grid, padding_mode)

    cu.grid_sample = probed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=2)
    args = ap.parse_args()

    install_probe()
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

    # UNJITTED forward: the probe must run eagerly per call
    for step in range(args.steps):
        REPORTS.clear()
        out, _ = model.apply(variables, batch_j, train=True,
                             rngs={'flip': jax.random.PRNGKey(2 + step)},
                             mutable=['batch_stats'])
        loss = float(out['loss'])
        print('step {}: loss {:.4f}, {} grid_sample calls'.format(
            step, loss, len(REPORTS)), flush=True)
        for shape, dt, gshape, s in REPORTS:
            fired = [k for k in ('viol_y', 'viol_tilt', 'viol_x')
                     if bool(s[k])]
            print('  src {} {}  grid {}  VIOLATION={}  fired={}'.format(
                shape, dt, gshape,
                bool(s['viol_y'] or s['viol_tilt'] or s['viol_x']),
                ','.join(fired) or '-'))
            print('    yspan max {} p99 {:.1f} (limit {})  rowoff max {} '
                  '(limit {})  frac_rows_y_viol {:.4f}'.format(
                      int(s['yspan_max']), float(s['yspan_p99']), 24 - 2,
                      int(s['rowoff_max']), 48 - 24,
                      float(s['frac_rows_y_viol'])))
            print('    xloc [{}, {}] (window 384)  frac_x_out {:.6f}'.format(
                int(s['xloc_min']), int(s['xloc_max']),
                float(s['frac_x_out'])))


if __name__ == '__main__':
    main()
