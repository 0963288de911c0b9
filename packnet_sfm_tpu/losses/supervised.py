"""
Supervised depth loss family — pure functions, jit-friendly (mask-weighted
statistics instead of boolean indexing).

Method registry by string suffix, matching the reference
(reference: packnet_sfm/losses/supervised_loss.py:84-237): l1, mse, berhu,
silog, abs_rel, ssi, enhanced-ssi, progressive-ssi, ssi-trim, ssi-silog.
'sparse-' prefix masks gt>0 and fills invalid entries of BOTH tensors with
eps before the loss (supervised_loss.py:292-341) — note this means plain-mean
losses (l1/mse/berhu) average over ALL pixels with zeros at invalid ones,
which we reproduce exactly.

SSI family: losses/ssi_loss.py:10-26, ssi_loss_enhanced.py:10-200,
ssi_trim_loss.py:4-51, ssi_silog_loss.py:53-420.
"""

import dataclasses

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.ops.image import match_scales
from packnet_sfm_tpu.ops.depth import inv2depth
from packnet_sfm_tpu.losses.photometric import ProgressiveScaling

EPS = 1e-6


def _masked_mean(x, mask):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


########################################################################################################################
# Elementary losses (operate on filled tensors + mask)

def l1_loss(pred, gt, mask):
    return jnp.mean(jnp.abs(pred - gt))          # filled: invalid contribute 0


def mse_loss(pred, gt, mask):
    return jnp.mean((pred - gt) ** 2)


def berhu_loss(pred, gt, mask, threshold=0.2):
    """BerHu (reference: supervised_loss.py:22-66): mean over the
    concatenation of all |diff| and the squared tail."""
    huber_c = threshold * jnp.max(pred - gt)
    diff = jnp.abs(pred - gt)
    over = (diff > huber_c)
    # cat((diff, diff[over]**2)).mean() == (sum(diff) + sum(over*diff^2)) / (N + n_over)
    n = diff.size
    n_over = jnp.sum(over)
    total = jnp.sum(diff) + jnp.sum(jnp.where(over, diff ** 2, 0.0))
    return total / (n + n_over)


def silog_loss(pred, gt, mask, ratio2=0.85):
    """Scale-invariant log loss (supervised_loss.py:67-80). The reference's
    SilogLoss has NO mask parameter: on the sparse path it receives the
    eps-FILLED tensors, whose invalid pixels contribute log_diff=0 but still
    count in the denominators (plain mean over ALL pixels) — reproduced
    exactly (golden-pinned in tests/test_supervised_golden.py)."""
    log_diff = jnp.log(jnp.maximum(pred, EPS)) - jnp.log(jnp.maximum(gt, EPS))
    silog1 = jnp.mean(log_diff ** 2)
    silog2 = ratio2 * jnp.mean(log_diff) ** 2
    return jnp.sqrt(jnp.abs(silog1 - silog2) + 1e-8)


def abs_rel_loss(pred, gt, mask):
    return jnp.mean(jnp.abs(pred - gt) / jnp.maximum(pred, EPS))


def ssi_loss(pred, gt, mask, alpha=0.85):
    """Scale-shift-invariant: var(diff) + alpha*mean(diff)^2 over mask."""
    m = mask.astype(pred.dtype)
    diff = pred - gt
    mean = _masked_mean(diff, m)
    var = _masked_mean(diff ** 2, m) - mean ** 2
    return var + alpha * mean ** 2


def enhanced_ssi_loss(pred, gt, mask, alpha=0.85, l1_weight=0.2,
                      ssi_weight=0.8, progress=None):
    """SSI + L1-in-depth mix with adaptive weights (ssi_loss_enhanced.py:10-134).
    jit-safe: `progress` may be a traced scalar."""
    m = mask.astype(pred.dtype)
    s = ssi_loss(pred, gt, mask, alpha)
    pred_d = 1.0 / (pred + 1e-6)
    gt_d = 1.0 / (gt + 1e-6)
    l1 = _masked_mean(jnp.abs(pred_d - gt_d), m)
    if progress is not None:
        p = jnp.clip(jnp.asarray(progress, jnp.float32), 0.0, 1.0)
        sw = ssi_weight + (1.0 - p) * 0.1
        lw = l1_weight + p * 0.1
        tot = sw + lw
        sw, lw = sw / tot, lw / tot
    else:
        sw, lw = ssi_weight, l1_weight
    return sw * s + lw * l1


def progressive_ssi_loss(pred, gt, mask, alpha=0.85, max_l1_weight=0.3,
                         transition_epochs=15, epoch=0):
    """Epoch-scheduled SSI/L1 mix (ssi_loss_enhanced.py:136-200).
    jit-safe: `epoch` may be a traced scalar (state.epoch)."""
    frac = jnp.minimum(jnp.asarray(epoch, jnp.float32) / transition_epochs,
                       1.0)
    lw = frac * max_l1_weight
    sw = 1.0 - lw
    m = mask.astype(pred.dtype)
    s = ssi_loss(pred, gt, mask, alpha)
    pred_d = 1.0 / (pred + 1e-6)
    gt_d = 1.0 / (gt + 1e-6)
    l1 = _masked_mean(jnp.abs(pred_d - gt_d), m)
    return sw * s + lw * l1


def ssi_trim_loss(pred, gt, mask, trim=0.2, eps=1e-6):
    """
    MiDaS-style scale-shift-invariant trimmed L1 (ssi_trim_loss.py:4-51):
    per image, least-squares align alpha*pred+beta to gt over the mask, then
    average the smallest (1-trim) fraction of masked residuals.
    """
    def per_image(p, g, m):
        m = m.astype(p.dtype)
        n = jnp.sum(m)
        mean_d = _masked_mean(p, m)
        mean_z = _masked_mean(g, m)
        var_d = _masked_mean((p - mean_d) ** 2, m) + eps
        cov = _masked_mean((p - mean_d) * (g - mean_z), m)
        alpha = jnp.clip(cov / var_d, 0.1, 10.0)
        beta = mean_z - alpha * mean_d
        res = jnp.abs(alpha * p + beta - g).reshape(-1)
        mflat = m.reshape(-1)
        # sort residuals with invalid pushed to +inf; keep smallest k
        res_inf = jnp.where(mflat > 0, res, jnp.inf)
        order = jnp.sort(res_inf)
        k = jnp.floor((1.0 - trim) * n).astype(jnp.int32)
        ranks = jnp.arange(order.shape[0])
        keep = (ranks < k).astype(p.dtype)
        trimmed = jnp.sum(jnp.where(jnp.isfinite(order), order, 0.0) * keep) \
            / jnp.maximum(k.astype(p.dtype), 1.0)
        return jnp.where(n >= 100, trimmed, 0.0)

    return jax.vmap(per_image)(pred, gt, mask).mean()


def ssi_silog_loss(pred_inv, gt_inv, mask, alpha=0.85, ssi_weight=0.7,
                   silog_weight=0.3, silog_ratio2=0.85, min_depth=None,
                   max_depth=None, gradient_weight=0.0, gradient_scales=4):
    """
    SSI (inverse-depth domain) + corrected Silog (depth domain) + optional
    multi-scale Sobel gradient loss (ssi_silog_loss.py:53-420).
    """
    m = mask.astype(pred_inv.dtype)
    # SSI in inverse-depth domain
    ssi = ssi_loss(pred_inv, gt_inv, mask, alpha)
    # Silog in depth domain with clamping
    pred_d = inv2depth(pred_inv)
    gt_d = inv2depth(gt_inv)
    cmin = 1e-3 if min_depth is None else float(min_depth)
    cmax = 100.0 if max_depth is None else float(max_depth)
    if cmax <= cmin:
        cmax = cmin + 1.0
    pred_c = jnp.clip(pred_d, cmin, cmax)
    gt_c = jnp.clip(gt_d, cmin, cmax)
    log_diff = jnp.log(pred_c) - jnp.log(gt_c)
    silog1 = _masked_mean(log_diff ** 2, m)
    silog2 = silog_ratio2 * _masked_mean(log_diff, m) ** 2
    silog = jnp.sqrt(jnp.abs(silog1 - silog2) + 1e-8)

    total = ssi_weight * ssi + silog_weight * silog

    if gradient_weight > 0.0:
        total = total + gradient_weight * _sobel_gradient_loss(
            pred_d, gt_d, m, gradient_scales)

    # SSI_SILOG_LOG=1: per-step component logging from inside the jitted
    # step (reference: ssi_silog_loss.py:366-406 SSI_SILOG_LOG_* dumps).
    # Env is read at trace time; the print itself is a traced side effect.
    import os
    if os.environ.get('SSI_SILOG_LOG', '0') == '1':
        jax.debug.print(
            '[SSI_SILOG_LOG] ssi={ssi:.5f} silog={silog:.5f} '
            '(silog1={s1:.5f} silog2={s2:.5f}) total={total:.5f} '
            'valid_px={n:.0f}', ssi=ssi, silog=silog, s1=silog1, s2=silog2,
            total=total, n=jnp.sum(m))

    # <100 valid pixels -> 0 (reference ssi_silog_loss.py:400-403)
    return jnp.where(jnp.sum(m) < 100, 0.0, total)


def _sobel_gradient_loss(pred_d, gt_d, mask, num_scales):
    """Multi-scale Sobel gradient L1 (G2-MonoDepth style, ssi_silog_loss.py:12-50,115-175)."""
    from packnet_sfm_tpu.ops.image import interpolate

    kx = jnp.array([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]])
    ky = kx.T

    def sobel(x, k):
        # valid conv, single channel [B,H,W,1]
        return jax.lax.conv_general_dilated(
            x, k[:, :, None, None], (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    total, valid_scales = 0.0, 0
    for s in range(num_scales):
        if s == 0:
            p, g, m = pred_d, gt_d, mask
        else:
            H, W = pred_d.shape[1] // 2 ** s, pred_d.shape[2] // 2 ** s
            if H < 3 or W < 3:
                break
            p = interpolate(pred_d, (H, W), 'bilinear', False)
            g = interpolate(gt_d, (H, W), 'bilinear', False)
            m = (interpolate(mask, (H, W), 'nearest') > 0.5).astype(mask.dtype)
        mg = m[:, 1:-1, 1:-1, :]
        lx = _masked_mean(jnp.abs(sobel(p, kx) - sobel(g, kx)), mg)
        ly = _masked_mean(jnp.abs(sobel(p, ky) - sobel(g, ky)), mg)
        total = total + lx + ly
        valid_scales += 1
    return total / max(valid_scales, 1)


########################################################################################################################
# Dispatcher


def get_loss_func(method, **kw):
    """Resolve the per-scale loss callable from the method suffix."""
    if method.endswith('ssi-silog'):
        return lambda p, g, m, progress=0.0, epoch=0: ssi_silog_loss(
            p, g, m,
            alpha=kw.get('alpha', 0.85),
            ssi_weight=kw.get('ssi_weight', 0.7),
            silog_weight=kw.get('silog_weight', 0.3),
            silog_ratio2=kw.get('silog_ratio2', 0.85),
            min_depth=kw.get('min_depth'), max_depth=kw.get('max_depth'),
            gradient_weight=kw.get('gradient_weight', 0.0),
            gradient_scales=kw.get('gradient_scales', 4))
    if method.endswith('enhanced-ssi'):
        return lambda p, g, m, progress=0.0, epoch=0: enhanced_ssi_loss(
            p, g, m, progress=progress)
    if method.endswith('progressive-ssi'):
        return lambda p, g, m, progress=0.0, epoch=0: progressive_ssi_loss(
            p, g, m, epoch=epoch)
    if method.endswith('ssi-trim'):
        return lambda p, g, m, progress=0.0, epoch=0: ssi_trim_loss(p, g, m)
    if method.endswith('ssi'):
        return lambda p, g, m, progress=0.0, epoch=0: ssi_loss(p, g, m)
    if method.endswith('l1'):
        return lambda p, g, m, progress=0.0, epoch=0: l1_loss(p, g, m)
    if method.endswith('mse'):
        return lambda p, g, m, progress=0.0, epoch=0: mse_loss(p, g, m)
    if method.endswith('berhu'):
        return lambda p, g, m, progress=0.0, epoch=0: berhu_loss(p, g, m)
    if method.endswith('silog'):
        return lambda p, g, m, progress=0.0, epoch=0: silog_loss(p, g, m)
    if method.endswith('abs_rel'):
        return lambda p, g, m, progress=0.0, epoch=0: abs_rel_loss(p, g, m)
    raise ValueError('Unknown supervised loss {}'.format(method))


@dataclasses.dataclass(frozen=True)
class SupervisedLoss:
    """Multi-scale supervised loss (reference: supervised_loss.py:243-478)."""
    supervised_method: str = 'sparse-l1'
    supervised_num_scales: int = 4
    progressive_scaling: float = 0.0
    loss_kwargs: tuple = ()

    def _loss_fn(self):
        return get_loss_func(self.supervised_method, **dict(self.loss_kwargs))

    def __call__(self, inv_depths, gt_inv_depth, masks=None, progress=0.0,
                 epoch=0):
        n = ProgressiveScaling(self.progressive_scaling,
                               self.supervised_num_scales)(progress)
        n = min(n, len(inv_depths))
        scale_shapes = [(d.shape[1], d.shape[2]) for d in inv_depths[:n]]
        gt_scales = match_scales(gt_inv_depth, scale_shapes, n, mode='nearest')
        loss_fn = self._loss_fn()

        metrics = {}
        if self.supervised_method.startswith('sparse'):
            total = 0.0
            for i in range(n):
                valid = (gt_scales[i] > 0.0).astype(inv_depths[i].dtype)
                if masks is not None and i < len(masks) and masks[i] is not None:
                    valid = valid * (masks[i] > 0).astype(valid.dtype)
                pred_f = jnp.where(valid > 0, inv_depths[i], EPS)
                gt_f = jnp.where(valid > 0, gt_scales[i], EPS)
                loss_i = loss_fn(pred_f, gt_f, valid,
                                 progress=progress, epoch=epoch)
                # per-scale logging (reference: supervised_loss.py:344-351)
                metrics['s{}/loss'.format(i)] = loss_i
                metrics['s{}/valid_ratio'.format(i)] = valid.mean()
                total = total + loss_i
            loss = total / float(n)
        else:
            loss = sum(
                loss_fn(inv_depths[i], gt_scales[i],
                        jnp.ones_like(gt_scales[i]), progress=progress,
                        epoch=epoch)
                for i in range(n)) / float(n)
        metrics['supervised_loss'] = loss
        return {'loss': loss, 'metrics': metrics}
