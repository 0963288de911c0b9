"""
Torch-golden tests for the FULL supervised-loss family (VERDICT round-1
item 7): every method suffix of the reference registry
(reference: losses/supervised_loss.py:84-237) is recomposed independently in
PyTorch — including the sparse fill/mask pipeline of
supervised_loss.py:292-418 — and compared against our SupervisedLoss on
fixed random inputs.

Intentional deviation pinned here: the reference's progressive-ssi epoch
plumbing is dead (calculate_loss reads getattr(self, '_epoch', 0) which is
never set, supervised_loss.py:348), so its L1 ramp never engages; we compare
at epoch=0 where both agree, and our framework actually threads the epoch.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.quick

from packnet_sfm_tpu.losses.supervised import SupervisedLoss  # noqa: E402

B, H, W = 2, 96, 128
EPS = 1e-6


########################################################################################################################
# torch golden recompositions (independent of the repo implementation)

def t_ssi(pred, gt, mask, alpha=0.85):
    d = pred[mask] - gt[mask]
    mean = d.mean()
    var = (d ** 2).mean() - mean ** 2
    return var + alpha * mean ** 2


def t_loss(method, pred, gt, mask, progress=0.0, epoch=0, **kw):
    """One-scale golden. `pred`/`gt` are the (possibly filled) tensors the
    reference hands its loss_func; `mask` the boolean valid mask (or None on
    the dense path)."""
    if method.endswith('ssi-silog'):
        ssi = t_ssi(pred, gt, mask, kw.get('alpha', 0.85))
        pred_d = 1.0 / pred.clamp(min=1e-6)
        gt_d = 1.0 / gt.clamp(min=1e-6)
        cmin = kw.get('min_depth') or 1e-3
        cmax = kw.get('max_depth') or 100.0
        ld = (torch.log(pred_d.clamp(cmin, cmax)[mask])
              - torch.log(gt_d.clamp(cmin, cmax)[mask]))
        var = (ld ** 2).mean() - kw.get('silog_ratio2', 0.85) * ld.mean() ** 2
        silog = torch.sqrt(var.abs() + 1e-8)
        total = (kw.get('ssi_weight', 0.7) * ssi
                 + kw.get('silog_weight', 0.3) * silog)
        gw = kw.get('gradient_weight', 0.0)
        if gw > 0:
            total = total + gw * t_msgrad(pred_d, gt_d, mask,
                                          kw.get('gradient_scales', 4))
        if mask.sum() < 100:
            return torch.tensor(0.0)
        return total
    if method.endswith('enhanced-ssi'):
        ssi = t_ssi(pred, gt, mask)
        l1 = (1.0 / (pred + 1e-6) - 1.0 / (gt + 1e-6)).abs()[mask].mean()
        p = max(0.0, min(1.0, progress))
        sw, lw = 0.8 + (1 - p) * 0.1, 0.2 + p * 0.1
        tot = sw + lw
        return (sw / tot) * ssi + (lw / tot) * l1
    if method.endswith('progressive-ssi'):
        ssi = t_ssi(pred, gt, mask)
        l1 = (1.0 / (pred + 1e-6) - 1.0 / (gt + 1e-6)).abs()[mask].mean()
        lw = min(epoch / 15.0, 1.0) * 0.3
        return (1 - lw) * ssi + lw * l1
    if method.endswith('ssi-trim'):
        total = 0.0
        for b in range(B):
            mb = mask[b]
            if mb.sum() < 100:
                continue
            d, z = pred[b][mb], gt[b][mb]
            var_d = torch.var(d, unbiased=False) + 1e-6
            cov = ((d - d.mean()) * (z - z.mean())).mean()
            a = torch.clamp(cov / var_d, 0.1, 10.0)
            be = z.mean() - a * d.mean()
            res = (a * pred[b] + be - gt[b]).abs()[mb]
            k = int(0.8 * res.numel())
            if k > 0:
                res = torch.sort(res)[0][:k]
                total = total + res.mean()
        return total / B
    if method.endswith('ssi'):
        return t_ssi(pred, gt, mask)
    if method.endswith('l1'):
        return (pred - gt).abs().mean()
    if method.endswith('mse'):
        return ((pred - gt) ** 2).mean()
    if method.endswith('berhu'):
        c = 0.2 * torch.max(pred - gt)
        diff = (pred - gt).abs()
        tail = diff[diff > c] ** 2
        return torch.cat((diff.reshape(-1), tail)).mean()
    if method.endswith('silog'):
        ld = torch.log(pred) - torch.log(gt)
        return torch.sqrt((ld ** 2).mean() - 0.85 * ld.mean() ** 2)
    if method.endswith('abs_rel'):
        return ((pred - gt).abs() / pred).mean()
    raise ValueError(method)


def t_msgrad(pred_d, gt_d, mask, scales):
    """Multi-scale Sobel gradient L1 (ssi_silog_loss.py:12-50,116-175)."""
    kx = torch.tensor([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]]
                      ).view(1, 1, 3, 3)
    ky = torch.tensor([[-1., -2., -1.], [0., 0., 0.], [1., 2., 1.]]
                      ).view(1, 1, 3, 3)
    total, ns = 0.0, 0
    for s in range(scales):
        if s == 0:
            p, g, m = pred_d, gt_d, mask
        else:
            sf = 1.0 / 2 ** s
            p = F.interpolate(pred_d, scale_factor=sf, mode='bilinear',
                              align_corners=False)
            g = F.interpolate(gt_d, scale_factor=sf, mode='bilinear',
                              align_corners=False)
            m = F.interpolate(mask.float(), scale_factor=sf,
                              mode='nearest') > 0.5
        if p.shape[2] < 3 or p.shape[3] < 3:
            continue
        mg = m[:, :, 1:-1, 1:-1]
        if mg.sum() > 0:
            lx = (F.conv2d(p, kx) - F.conv2d(g, kx)).abs()[mg].mean()
            ly = (F.conv2d(p, ky) - F.conv2d(g, ky)).abs()[mg].mean()
            total = total + lx + ly
            ns += 1
    return total / max(ns, 1)


def t_supervised(method, sigmoids, gt_inv, progress=0.0, epoch=0, **kw):
    """Full reference pipeline: nearest GT matching + sparse fill + per-scale
    mean (supervised_loss.py:292-432)."""
    n = len(sigmoids)
    gts = [F.interpolate(gt_inv, size=s.shape[-2:], mode='nearest')
           for s in sigmoids]
    total = 0.0
    for i in range(n):
        if method.startswith('sparse'):
            valid = gts[i] > 0
            pred_f = sigmoids[i].masked_fill(~valid, EPS)
            gt_f = gts[i].masked_fill(~valid, EPS)
            total = total + t_loss(method, pred_f, gt_f, valid,
                                   progress, epoch, **kw)
        else:
            mask = torch.ones_like(gts[i], dtype=torch.bool)
            total = total + t_loss(method, sigmoids[i], gts[i], mask,
                                   progress, epoch, **kw)
    return total / n


########################################################################################################################


def make_inputs(sparse=True, seed=0):
    rng = np.random.RandomState(seed)
    sig = [np.clip(rng.rand(B, H // 2 ** i, W // 2 ** i, 1), 1e-3, 1.0
                   ).astype(np.float32) for i in range(4)]
    gt = (rng.rand(B, H, W, 1) * 1.8 + 0.07).astype(np.float32)
    if sparse:
        gt = gt * (rng.rand(B, H, W, 1) < 0.3)
    return sig, gt.astype(np.float32)


def to_t(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


SPARSE_METHODS = [
    ('sparse-l1', {}),
    ('sparse-mse', {}),
    ('sparse-berhu', {}),
    ('sparse-silog', {}),
    ('sparse-abs_rel', {}),
    ('sparse-ssi', {}),
    ('sparse-enhanced-ssi', {}),
    ('sparse-progressive-ssi', {}),
    ('sparse-ssi-trim', {}),
    ('sparse-ssi-silog', dict(min_depth=0.5, max_depth=15.0)),
    ('sparse-ssi-silog', dict(min_depth=0.5, max_depth=15.0,
                              gradient_weight=0.1, gradient_scales=4)),
]


@pytest.mark.parametrize('method,kw', SPARSE_METHODS,
                         ids=[m + ('+grad' if 'gradient_weight' in k else '')
                              for m, k in SPARSE_METHODS])
def test_sparse_golden(method, kw):
    sig, gt = make_inputs(sparse=True)
    progress = 0.37
    loss = SupervisedLoss(supervised_method=method,
                          loss_kwargs=tuple(kw.items()))
    ours = loss([jnp.asarray(s) for s in sig], jnp.asarray(gt),
                progress=progress, epoch=0)['loss']
    golden = t_supervised(method, [to_t(s) for s in sig], to_t(gt),
                          progress=progress, epoch=0, **kw)
    # the Sobel-gradient path differences huge filled-depth values (1/EPS at
    # invalid pixels ~1e6) through bilinear downsampling, so fp32
    # accumulation-order noise reaches ~1e-3 relative; a semantic mismatch
    # shows up at O(10%+).
    rtol = 5e-3 if kw.get('gradient_weight', 0.0) > 0 else 2e-4
    np.testing.assert_allclose(float(ours), float(golden),
                               rtol=rtol, atol=1e-6)


@pytest.mark.parametrize('method', ['l1', 'mse', 'berhu', 'ssi'])
def test_dense_golden(method):
    sig, gt = make_inputs(sparse=False)
    loss = SupervisedLoss(supervised_method=method)
    ours = loss([jnp.asarray(s) for s in sig], jnp.asarray(gt))['loss']
    golden = t_supervised(method, [to_t(s) for s in sig], to_t(gt))
    np.testing.assert_allclose(float(ours), float(golden),
                               rtol=2e-4, atol=1e-6)


def test_progressive_ssi_epoch_ramp():
    """Our epoch plumbing is live (unlike the reference's dead _epoch):
    the L1 mix must change the loss at epoch 15 vs epoch 0."""
    sig, gt = make_inputs(sparse=True)
    loss = SupervisedLoss(supervised_method='sparse-progressive-ssi')
    l0 = float(loss([jnp.asarray(s) for s in sig], jnp.asarray(gt),
                    epoch=0)['loss'])
    l15 = float(loss([jnp.asarray(s) for s in sig], jnp.asarray(gt),
                     epoch=15)['loss'])
    assert l0 != pytest.approx(l15)
