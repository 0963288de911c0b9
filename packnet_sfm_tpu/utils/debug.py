"""
Env-gated debug instrumentation (the reference's secondary flag layer,
SURVEY.md §5):

- DISP_STATS_ONCE=1 / DISP_STATS_EVERY=1: print disparity statistics for
  scale-0 predictions (reference: ResNetSAN01.py:154-208)
- FORCE_DEPTH_DIV256=1: treat GT depth as raw 16-bit png counts and divide
  by 256 at evaluation time (reference: model_wrapper.py:723-732)
- GT_DEPTH_DEBUG=1: print GT depth histogram stats before the supervised
  loss (reference: SemiSupCompletionModel.py:140-431, condensed)
"""

import os

import numpy as np

_done_flags = set()


def _enabled(name):
    every = os.environ.get(name + '_EVERY', '0') == '1'
    once = os.environ.get(name + '_ONCE', '0') == '1'
    if every:
        return True
    if once and name not in _done_flags:
        _done_flags.add(name)
        return True
    return False


def maybe_log_disp_stats(disp):
    """Print quantile/saturation stats of a sigmoid disparity map."""
    if not _enabled('DISP_STATS'):
        return
    v = np.asarray(disp)
    v = v[np.isfinite(v)]
    if v.size == 0:
        print('[DISP_STATS] no finite values')
        return
    q = np.percentile(v, [0, 1, 5, 50, 95, 99, 100])
    print('[DISP_STATS] scale0: min={:.4g} p1={:.4g} p5={:.4g} med={:.4g} '
          'p95={:.4g} p99={:.4g} max={:.4g} mean={:.4g} std={:.4g} '
          'sat>0.99={:.4f} sat<0.01={:.4f}'.format(
              *q, v.mean(), v.std(), (v > 0.99).mean(), (v < 0.01).mean()))


def maybe_force_depth_div256(gt):
    """FORCE_DEPTH_DIV256 escape hatch for mis-scaled GT depth."""
    if os.environ.get('FORCE_DEPTH_DIV256', '0') == '1':
        return gt / 256.0
    return gt


def maybe_one_step_viz(eval_step, state, batch):
    """ONE_STEP_VIZ_DIR=<dir>: dump one training batch's rgb / predicted
    inverse-depth / GT panels, once (reference: ONE_STEP_VIZ_DIR in
    SemiSupCompletionModel.py:140-431 — visual sanity check of the exact
    tensors entering the loss)."""
    out_dir = os.environ.get('ONE_STEP_VIZ_DIR', '')
    if not out_dir or 'ONE_STEP_VIZ' in _done_flags:
        return
    _done_flags.add('ONE_STEP_VIZ')
    from PIL import Image
    from packnet_sfm_tpu.utils.viz import viz_inv_depth
    os.makedirs(out_dir, exist_ok=True)
    out = eval_step(state, batch)

    def save(arr, name):
        Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, name))

    rgb = np.asarray(batch['rgb'])
    n = min(2, rgb.shape[0])
    for i in range(n):
        save(rgb[i], 'sample{}_rgb.png'.format(i))
        if 'inv_depths' in out:
            sig = np.asarray(out['inv_depths'][0])[i, ..., 0]
            save(viz_inv_depth(sig), 'sample{}_pred_inv_depth.png'.format(i))
        for key in ('depth', 'input_depth'):
            if key in batch:
                d = np.asarray(batch[key])[i, ..., 0]
                inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-6), 0.0)
                save(viz_inv_depth(inv), 'sample{}_{}.png'.format(i, key))
    print('[ONE_STEP_VIZ] wrote {} samples to {}'.format(n, out_dir))


def maybe_log_gt_depth(depth):
    if not _enabled('GT_DEPTH_DEBUG'):
        return
    d = np.asarray(depth)
    pos = d[d > 0]
    if pos.size:
        print('[GT_DEPTH_DEBUG] valid={:.2%} min={:.3f} max={:.3f} '
              'p50={:.3f} p95={:.3f}'.format(
                  pos.size / d.size, pos.min(), pos.max(),
                  np.percentile(pos, 50), np.percentile(pos, 95)))
    else:
        print('[GT_DEPTH_DEBUG] no valid pixels')
