"""
On-device augmentation (jit-friendly, batched, PRNG-keyed).

TPU-native replacement for the host-side per-sample color jitter
(reference: datasets/augmentations.py colorjitter_sample + torchvision
ColorJitter): the host pipeline ships raw images and the jitter runs inside
the jitted train step on the accelerator — per-sample random factors, the
SAME factors applied to target and context frames (reference parity), and
the un-jittered originals left untouched for the photometric loss.

Enable with cfg.tpu.device_augment (the host pipeline then skips jitter).
"""

import jax
import jax.numpy as jnp


def _rgb_to_gray(img):
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def _adjust(img, fb, fc, fs):
    """brightness -> contrast -> saturation with per-image factors [B,1,1,1]."""
    img = jnp.clip(img * fb, 0.0, 1.0)
    mean = img.mean(axis=(1, 2, 3), keepdims=True)
    img = jnp.clip((img - mean) * fc + mean, 0.0, 1.0)
    gray = _rgb_to_gray(img)
    return jnp.clip((img - gray) * fs + gray, 0.0, 1.0)


def _hue_rotate(img, f):
    """Cheap hue rotation via YIQ rotation (smooth, jit-friendly)."""
    # RGB -> YIQ
    y = _rgb_to_gray(img)[..., 0]
    i = 0.596 * img[..., 0] - 0.274 * img[..., 1] - 0.322 * img[..., 2]
    q = 0.211 * img[..., 0] - 0.523 * img[..., 1] + 0.312 * img[..., 2]
    ang = 2.0 * jnp.pi * f[..., 0, 0, 0][:, None, None]
    ci, si = jnp.cos(ang), jnp.sin(ang)
    i2 = ci * i - si * q
    q2 = si * i + ci * q
    r = y + 0.956 * i2 + 0.621 * q2
    g = y - 0.272 * i2 - 0.647 * q2
    b = y - 1.106 * i2 + 1.703 * q2
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def device_color_jitter(batch, key, jittering):
    """
    Jitter batch['rgb'] and batch['rgb_context'] with per-sample factors;
    'rgb_original'/'rgb_context_original' are preserved (photometric loss
    consumes the un-jittered copies, reference transforms.py:21-50).
    """
    b, c, s, h = jittering
    B = batch['rgb'].shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)

    def factor(k, strength):
        lo = max(0.0, 1.0 - strength)
        return jax.random.uniform(k, (B, 1, 1, 1), minval=lo,
                                  maxval=1.0 + strength)

    fb = factor(kb, b)
    fc = factor(kc, c)
    fs = factor(ks, s)
    fh = jax.random.uniform(kh, (B, 1, 1, 1), minval=-h, maxval=h)

    def jit_img(img):
        img = _adjust(img, fb, fc, fs)
        if h > 0:
            img = _hue_rotate(img, fh)
        return img

    out = dict(batch)
    out.setdefault('rgb_original', batch['rgb'])
    out['rgb'] = jit_img(batch['rgb'])
    if 'rgb_context' in batch and batch['rgb_context']:
        out.setdefault('rgb_context_original', list(batch['rgb_context']))
        out['rgb_context'] = [jit_img(im) for im in batch['rgb_context']]
    return out
