"""
Env-gated debug instrumentation (the reference's secondary flag layer,
SURVEY.md §5):

- DISP_STATS_ONCE=1 / DISP_STATS_EVERY=1: print disparity statistics for
  scale-0 predictions (reference: ResNetSAN01.py:154-208)
- FORCE_DEPTH_DIV256=1: treat GT depth as raw 16-bit png counts and divide
  by 256 at evaluation time (reference: model_wrapper.py:723-732)
- GT_DEPTH_DEBUG_{ONCE,EVERY}=1 (+ _DIR, GT_DEPTH_HIST_BINS): full GT
  depth forensics before the supervised loss — quantiles, invalid-pixel
  census, near-zero fractions, smallest samples with coordinates,
  depth2inv sanity, histogram PNG+JSON
  (reference: SemiSupCompletionModel.py:296-431 _debug_gt_depth)
- LOSS_INV_VIZ_{ONCE,EVERY}=1 (+ _DIR): distribution of the exact
  pred-inverse-depth / GT-inverse-depth pair entering the supervised
  loss at scale 0 — stats, saturation fractions, histograms
  (reference: SemiSupCompletionModel.py:191-294 _save_loss_inv_debug)
"""

import json
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


def _tensor_stats(x):
    """Quantile/mean/std summary over finite values (reference
    tensor_stats, SemiSupCompletionModel.py:222-233)."""
    v = np.asarray(x, np.float64)
    v = v[np.isfinite(v)]
    if v.size == 0:
        return {}
    q = np.quantile(v, [0.0, 0.01, 0.05, 0.5, 0.95, 0.99, 1.0])
    return {'min': float(q[0]), 'p1': float(q[1]), 'p5': float(q[2]),
            'median': float(q[3]), 'p95': float(q[4]), 'p99': float(q[5]),
            'max': float(q[6]), 'mean': float(v.mean()),
            'std': float(v.std(ddof=1)) if v.size > 1 else 0.0,
            'numel': int(v.size)}


def _save_hist(x, name, save_dir, bins=80):
    """Histogram of finite values as <name>_hist.{json,png} (PNG only if
    matplotlib imports; JSON is the canonical artifact)."""
    v = np.asarray(x, np.float64).ravel()
    v = v[np.isfinite(v)]
    if v.size == 0:
        return
    vmin, vmax = float(v.min()), float(v.max())
    if vmax - vmin < 1e-12:
        return
    counts, edges = np.histogram(v, bins=bins, range=(vmin, vmax))
    with open(os.path.join(save_dir, 'step0_{}_hist.json'.format(name)),
              'w') as f:
        json.dump({'edges': edges.tolist(), 'counts': counts.tolist(),
                   'min': vmin, 'max': vmax}, f)
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
    except Exception:
        return
    plt.figure(figsize=(4, 3), dpi=120)
    plt.bar(edges[:-1], counts, width=float(edges[1] - edges[0]),
            align='edge')
    plt.title(name)
    plt.tight_layout()
    plt.savefig(os.path.join(save_dir, 'step0_{}_hist.png'.format(name)))
    plt.close()


def _nearest_resize_2d(img, out_h, out_w):
    """Host-side nearest resize of [H,W] (torch F.interpolate 'nearest'
    index convention: src = floor(dst * scale))."""
    h, w = img.shape
    ys = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    return img[ys][:, xs]


def maybe_dump_loss_inv_debug(pred_inv, gt_depth):
    """LOSS_INV_VIZ_{ONCE,EVERY}=1: dump the distribution of the exact
    (pred inverse depth, GT inverse depth) pair entering the supervised
    loss at scale 0 — per-tensor stats, |diff| stats, saturation and
    gt_inv>1 overflow fractions, histograms
    (reference: SemiSupCompletionModel.py:191-294).

    pred_inv: [B,H,W,1] inverse depth (post sigmoid->inv conversion);
    gt_depth: [B,H',W',1] metric GT depth (0 = invalid)."""
    if not _enabled('LOSS_INV_VIZ'):
        return
    save_dir = os.environ.get('LOSS_INV_VIZ_DIR', 'loss_inv_viz')
    os.makedirs(save_dir, exist_ok=True)

    p0 = np.asarray(pred_inv)[0, ..., 0].astype(np.float64)
    d0 = np.asarray(gt_depth)[0, ..., 0].astype(np.float64)
    # depth2inv semantics (reference utils/depth.py:140-142)
    g0 = np.where(d0 > 0, 1.0 / np.maximum(d0, 1e-6), 0.0)
    if g0.shape != p0.shape:
        g0 = _nearest_resize_2d(g0, *p0.shape)
    abs_diff = np.abs(p0 - g0)

    _save_hist(p0, 'pred_inv', save_dir)
    _save_hist(g0, 'gt_inv', save_dir)
    _save_hist(abs_diff, 'abs_diff', save_dir)

    st_pred, st_gt, st_abs = (_tensor_stats(t) for t in (p0, g0, abs_diff))
    sat_hi = float((p0 > 0.99).mean())
    sat_lo = float((p0 < 0.01).mean())
    overflow = float((g0 > 1.0).mean())
    with open(os.path.join(save_dir, 'step0_stats.json'), 'w') as f:
        json.dump({'pred_inv': st_pred, 'gt_inv': st_gt,
                   'abs_diff': st_abs, 'frac_pred>0.99': sat_hi,
                   'frac_pred<0.01': sat_lo, 'frac_gt_inv>1.0': overflow},
                  f, indent=2)
    print('[LOSS_INV_VIZ] pred_inv:', st_pred)
    print('[LOSS_INV_VIZ] gt_inv  :', st_gt)
    print('[LOSS_INV_VIZ] abs_diff:', st_abs)
    print('[LOSS_INV_VIZ] sat_hi={:.3f} sat_lo={:.3f} '
          'overflow(gt_inv>1)={:.3f}'.format(sat_hi, sat_lo, overflow))
    print('[LOSS_INV_VIZ] Saved hist & stats to {}'.format(save_dir))


def maybe_dump_gt_depth_debug(depth):
    """GT_DEPTH_DEBUG_{ONCE,EVERY}=1: full GT-depth forensics before the
    supervised loss — quantiles over valid pixels, invalid census,
    near-zero fractions, 10 smallest samples with (y,x), depth2inv
    sanity fractions, histogram (GT_DEPTH_HIST_BINS, default 80)
    (reference: SemiSupCompletionModel.py:296-431)."""
    if not _enabled('GT_DEPTH_DEBUG'):
        return
    save_dir = os.environ.get('GT_DEPTH_DEBUG_DIR', 'gt_depth_debug')
    os.makedirs(save_dir, exist_ok=True)

    d = np.asarray(depth).astype(np.float64)
    valid = (d > 0) & np.isfinite(d)
    v = d[valid]
    stats = _tensor_stats(v) if v.size else {
        k: None for k in ('min', 'p1', 'p5', 'median', 'p95', 'p99',
                          'max', 'mean', 'std')}
    stats.pop('numel', None)
    stats['numel_total'] = int(d.size)
    stats['numel_valid'] = int(valid.sum())
    stats['numel_zero_or_neg'] = int((d <= 0).sum())
    for th in (0.01, 0.02, 0.05, 0.1):
        stats['frac_depth<{}'.format(th)] = float(((d > 0) & (d < th)).mean())

    # 10 smallest valid depths with flattened (y,x) coordinates (batch
    # folded into y, matching the reference's flat // W convention)
    smallest = []
    if v.size:
        w = d.shape[-2] if d.shape[-1] == 1 else d.shape[-1]
        flat = d.reshape(-1)
        idx_valid = np.nonzero(valid.reshape(-1))[0]
        order = np.argsort(flat[idx_valid], kind='stable')[:10]
        for i in idx_valid[order]:
            smallest.append({'y': int(i // w), 'x': int(i % w),
                             'depth': float(flat[i])})
    stats['smallest_samples'] = smallest

    # depth2inv sanity (0 stays 0; flags collapsing near-zero depths)
    inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-6), 0.0)
    inv_v = inv[valid]
    stats['inv_numel_valid'] = int(inv_v.size)
    stats['inv_max'] = float(inv_v.max()) if inv_v.size else None
    stats['inv_min'] = float(inv_v.min()) if inv_v.size else None
    stats['inv_frac>2'] = float((inv_v > 2.0).mean()) if inv_v.size else 0.0
    stats['inv_frac>10'] = float((inv_v > 10.0).mean()) if inv_v.size else 0.0
    stats['inv_frac_inf_or_nan'] = (
        float((~np.isfinite(inv_v)).mean()) if inv_v.size else 0.0)

    if v.size:
        bins = int(os.environ.get('GT_DEPTH_HIST_BINS', '80'))
        _save_hist(v, 'gt_depth', save_dir, bins=bins)
    with open(os.path.join(save_dir, 'step0_gt_depth_stats.json'),
              'w') as f:
        json.dump(stats, f, indent=2)

    if v.size:
        print('[GT_DEPTH_DEBUG] depth stats:', ' '.join(
            '{}={:.4g}'.format(k, stats[k])
            for k in ('min', 'p1', 'p5', 'median', 'p95', 'p99', 'max',
                      'mean', 'std') if stats[k] is not None))
    else:
        print('[GT_DEPTH_DEBUG] no valid pixels')
    print('[GT_DEPTH_DEBUG] small_depth_fracs: ' + ' '.join(
        '<{}={:.4f}'.format(th, stats['frac_depth<{}'.format(th)])
        for th in (0.01, 0.02, 0.05, 0.1)))
    print('[GT_DEPTH_DEBUG] zero_or_neg={} / {} valid={}'.format(
        stats['numel_zero_or_neg'], stats['numel_total'],
        stats['numel_valid']))
    if smallest:
        print('[GT_DEPTH_DEBUG] smallest_samples:', ', '.join(
            '(y={},x={},d={:.4f})'.format(s['y'], s['x'], s['depth'])
            for s in smallest))
    print('[GT_DEPTH_DEBUG] inv_max={} inv_frac>2={:.4f} '
          'inv_frac>10={:.4f} inf_or_nan={:.4f}'.format(
              stats['inv_max'], stats['inv_frac>2'], stats['inv_frac>10'],
              stats['inv_frac_inf_or_nan']))
    print('[GT_DEPTH_DEBUG] saved JSON to {}'.format(save_dir))


def _any_flag(name):
    """Would _enabled(name) fire? (ONCE flags stop firing after their
    first consumption — keeps the dispatcher's pre-check in sync so the
    debug forward isn't re-run every step after a ONCE dump.)"""
    if os.environ.get(name + '_EVERY', '0') == '1':
        return True
    return os.environ.get(name + '_ONCE', '0') == '1' and \
        name not in _done_flags


def maybe_debug_train_batch(eval_step, state, batch, params):
    """Per-train-step dispatcher for the GT_DEPTH_DEBUG / LOSS_INV_VIZ
    dump families. A cheap env check when off; when LOSS_INV_VIZ is on,
    runs the model forward once to recover the scale-0 inverse depth the
    supervised loss sees (sigmoid -> bounded inv conversion mirrors
    SemiSupCompletionModel's loss input)."""
    if 'depth' in batch and _any_flag('GT_DEPTH_DEBUG'):
        maybe_dump_gt_depth_debug(batch['depth'])
    if 'depth' in batch and _any_flag('LOSS_INV_VIZ'):
        out = eval_step(state, batch)
        if 'inv_depths' in out:
            from packnet_sfm_tpu.ops.depth import sigmoid_to_inv_depth
            pred_inv = sigmoid_to_inv_depth(
                out['inv_depths'][0], params.min_depth, params.max_depth,
                params.get('use_log_space', False))
            maybe_dump_loss_inv_debug(pred_inv, batch['depth'])
