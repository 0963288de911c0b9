"""
Advanced augmentations: RandAugment, RandomErasing (per-sample) and
MixUp / CutMix (batch-level, applied in the collate path).

Reference: datasets/augmentations_kitti_compatible.py:20-271, enabled via
configs/default_config.py:167-189 and wired in model_wrapper.py:1153-1158.
Host-side numpy implementations (HWC float in [0,1]); geometric ops are
restricted to photometric-safe ones for depth training (as the reference's
KITTI-compatible variants do).
"""

import numpy as np

from packnet_sfm_tpu.datasets.transforms import (
    _adjust_brightness, _adjust_contrast, _adjust_saturation, _adjust_hue)


def _autocontrast(img, _):
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    return (img - lo) / np.maximum(hi - lo, 1e-6)


def _equalize(img, _):
    out = np.empty_like(img)
    for c in range(img.shape[-1]):
        ch = (img[..., c] * 255).astype(np.uint8)
        hist = np.bincount(ch.ravel(), minlength=256)
        cdf = hist.cumsum()
        cdf = cdf / max(cdf[-1], 1)
        out[..., c] = cdf[ch]
    return out.astype(np.float32)


def _posterize(img, m):
    bits = max(1, int(8 - 4 * m))
    q = (img * 255).astype(np.uint8) >> (8 - bits) << (8 - bits)
    return q.astype(np.float32) / 255.0


def _solarize(img, m):
    thresh = 1.0 - m
    return np.where(img >= thresh, 1.0 - img, img).astype(np.float32)


def _sharpness(img, m):
    k = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0
    blurred = np.stack([_conv2(img[..., c], k) for c in range(img.shape[-1])],
                       axis=-1)
    f = 1.0 + m
    return np.clip(blurred + (img - blurred) * f, 0, 1).astype(np.float32)


def _conv2(x, k):
    from numpy.lib.stride_tricks import sliding_window_view
    pad = np.pad(x, 1, mode='edge')
    win = sliding_window_view(pad, (3, 3))
    return np.einsum('ijkl,kl->ij', win, k)


RANDAUGMENT_OPS = [
    ('brightness', lambda img, m: _adjust_brightness(img, 1 + m)),
    ('brightness_down', lambda img, m: _adjust_brightness(img, 1 - 0.5 * m)),
    ('contrast', lambda img, m: _adjust_contrast(img, 1 + m)),
    ('saturation', lambda img, m: _adjust_saturation(img, 1 + m)),
    ('hue', lambda img, m: _adjust_hue(img, 0.1 * m)),
    ('autocontrast', _autocontrast),
    ('equalize', _equalize),
    ('posterize', _posterize),
    ('solarize', _solarize),
    ('sharpness', _sharpness),
]


class RandAugment:
    """Pick n photometric ops at magnitude m (reference :20-120)."""

    def __init__(self, n=2, m=0.5, prob=0.5):
        self.n = n
        self.m = m
        self.prob = prob

    def __call__(self, img, rng):
        if rng.rand() >= self.prob:
            return img
        idxs = rng.choice(len(RANDAUGMENT_OPS), size=min(self.n, 3),
                          replace=False)
        for i in idxs:
            img = RANDAUGMENT_OPS[i][1](img, self.m)
        return np.clip(img, 0, 1).astype(np.float32)


class RandomErasing:
    """Erase a random rectangle with the dataset mean (reference :122-170)."""

    def __init__(self, probability=0.1, sl=0.02, sh=0.4, r1=0.3,
                 mean=(0.485, 0.456, 0.406)):
        self.p = probability
        self.sl, self.sh, self.r1 = sl, sh, r1
        self.mean = np.asarray(mean, np.float32)

    def __call__(self, img, rng):
        if rng.rand() >= self.p:
            return img
        H, W = img.shape[:2]
        area = H * W
        for _ in range(10):
            target = rng.uniform(self.sl, self.sh) * area
            ratio = rng.uniform(self.r1, 1.0 / self.r1)
            h = int(round(np.sqrt(target * ratio)))
            w = int(round(np.sqrt(target / ratio)))
            if h < H and w < W:
                y = rng.randint(0, H - h)
                x = rng.randint(0, W - w)
                img = img.copy()
                img[y:y + h, x:x + w] = self.mean
                return img
        return img


def mixup_batch(batch, alpha=0.2, prob=0.5, rng=None):
    """Batch-level MixUp on rgb (+ originals); depth is NOT mixed
    (sparse GT semantics, reference :172-220)."""
    rng = rng or np.random
    if rng.rand() >= prob:
        return batch
    lam = rng.beta(alpha, alpha)
    lam = max(lam, 1 - lam)  # keep the dominant sample's GT meaningful
    perm = rng.permutation(batch['rgb'].shape[0])
    for key in ('rgb', 'rgb_original'):
        if key in batch:
            batch[key] = lam * batch[key] + (1 - lam) * batch[key][perm]
    return batch


def cutmix_batch(batch, alpha=1.0, prob=0.5, rng=None):
    """Batch-level CutMix on rgb; the GT depth region follows the patch
    (reference :222-271)."""
    rng = rng or np.random
    if rng.rand() >= prob:
        return batch
    lam = rng.beta(alpha, alpha)
    B, H, W, _ = batch['rgb'].shape
    cut = np.sqrt(1 - lam)
    ch, cw = int(H * cut), int(W * cut)
    cy, cx = rng.randint(H), rng.randint(W)
    y1, y2 = np.clip(cy - ch // 2, 0, H), np.clip(cy + ch // 2, 0, H)
    x1, x2 = np.clip(cx - cw // 2, 0, W), np.clip(cx + cw // 2, 0, W)
    perm = rng.permutation(B)
    for key in ('rgb', 'rgb_original', 'depth', 'input_depth'):
        if key in batch:
            batch[key] = batch[key].copy()
            batch[key][:, y1:y2, x1:x2] = batch[key][perm][:, y1:y2, x1:x2]
    return batch


def make_advanced_collate(aug_cfg, base_collate, seed=0):
    """Wrap a collate_fn with MixUp/CutMix batch augments when enabled."""
    rng = np.random.RandomState(seed)
    mixup_cfg = aug_cfg.get('mixup', {})
    cutmix_cfg = aug_cfg.get('cutmix', {})

    def collate(samples):
        batch = base_collate(samples)
        if mixup_cfg.get('enabled', False):
            batch = mixup_batch(batch, mixup_cfg.get('alpha', 0.2),
                                mixup_cfg.get('prob', 0.5), rng)
        if cutmix_cfg.get('enabled', False):
            batch = cutmix_batch(batch, cutmix_cfg.get('alpha', 1.0),
                                 cutmix_cfg.get('prob', 0.5), rng)
        return batch
    return collate
