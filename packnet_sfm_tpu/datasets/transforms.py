"""
Sample transform pipeline (host-side numpy, HWC float32 in [0,1]).

Reference semantics (datasets/transforms.py:21-171, datasets/augmentations.py,
utils/misc.py:77-146):
- train: crop borders -> resize (scaling K / fisheye ux,uy) -> duplicate
  originals -> color jitter -> (tensors)
- val/test: crop -> resize rgb (+ depth: sparse-preserving scatter for input
  depth, nearest for eval depth on test)
- parse_crop_borders: negative = from opposite border, float = centered
  percentage
- resize_depth_preserve scatters valid points instead of interpolating
  (augmentations.py:58-100)

RGB resize uses PIL LANCZOS to match the reference's pixel values.
"""

import numpy as np
from PIL import Image


def _is_int(x):
    return isinstance(x, (int, np.integer))


def _axis_bounds(start_raw, end_raw, size):
    """Resolve one axis of the 4-value crop form to [start, end).

    Integers: a negative start counts back from the far border; an end <= 0
    also counts from the far border, while a positive end is a LENGTH from
    the resolved start. Floats: start_raw is a center FRACTION of the axis
    and end_raw an extent in pixels, centered on it.
    """
    if _is_int(start_raw):
        start = start_raw + size if start_raw < 0 else start_raw
        end = end_raw + size if end_raw <= 0 else start + end_raw
        return start, end
    center = start_raw * size
    return int(center - end_raw / 2), int(center + end_raw / 2)


def _axis_margin(value, size):
    """Resolve one axis of the 2-value crop form: a positive value trims
    from the near border, a negative one from the far border."""
    return max(0, value), size + min(0, value)


def parse_crop_borders(borders, shape):
    """(left, top, right, bottom) crop window from the crop mini-language.

    Behavioral contract (must match reference utils/misc.py:77-146, pinned
    by golden tests):
    - () keeps the full image
    - (ys, ye, xs, xe): per-axis int offsets/lengths or float
      center-fraction + pixel-extent pairs (see _axis_bounds); the two axes
      resolve independently, so mixed int/float axes are legal
    - (extent, value): int -> symmetric margin trim on both axes; float ->
      `value` is the center fraction and `extent` the pixel size of a
      centered window on both axes
    """
    H, W = shape[0], shape[1]
    if len(borders) == 0:
        return 0, 0, W, H
    if len(borders) == 4:
        ys, ye, xs, xe = borders
        left, right = _axis_bounds(xs, xe, W)
        top, bottom = _axis_bounds(ys, ye, H)
    elif len(borders) == 2:
        extent, value = borders
        if _is_int(value):
            left, right = _axis_margin(value, W)
            top, bottom = _axis_margin(extent, H)
        else:
            left, right = _axis_bounds(value, extent, W)
            top, bottom = _axis_bounds(value, extent, H)
    else:
        raise NotImplementedError('Crop tuple must have 2 or 4 values.')
    assert 0 <= left < right <= W and 0 <= top < bottom <= H, \
        'Crop borders {} are invalid'.format((left, top, right, bottom))
    return left, top, right, bottom


########################################################################################################################
# Primitive ops


def resize_image(image, shape):
    """LANCZOS resize of an [H,W,3] float image to (H',W')."""
    pil = Image.fromarray(np.clip(image * 255, 0, 255).astype(np.uint8))
    pil = pil.resize((shape[1], shape[0]), Image.LANCZOS)
    return np.asarray(pil, np.float32) / 255.0


def resize_depth(depth, shape):
    """Nearest-neighbor depth resize [h,w(,1)] -> [H,W,1]."""
    d = np.squeeze(depth)
    h, w = d.shape
    ys = np.floor(np.arange(shape[0]) * (h / shape[0])).astype(int)
    xs = np.floor(np.arange(shape[1]) * (w / shape[1])).astype(int)
    return d[ys][:, xs][..., None].astype(np.float32)


def resize_depth_preserve(depth, shape):
    """Scatter valid depth points into the resized map (no interpolation)."""
    if depth is None:
        return depth
    d = np.squeeze(depth)
    h, w = d.shape
    x = d.reshape(-1)
    uv = np.mgrid[:h, :w].transpose(1, 2, 0).reshape(-1, 2)
    idx = x > 0
    crd, val = uv[idx], x[idx]
    crd = crd.astype(np.float64)
    crd[:, 0] = (crd[:, 0] * (shape[0] / h)).astype(np.int32)
    crd[:, 1] = (crd[:, 1] * (shape[1] / w)).astype(np.int32)
    crd = crd.astype(np.int32)
    inside = (crd[:, 0] < shape[0]) & (crd[:, 1] < shape[1])
    crd, val = crd[inside], val[inside]
    out = np.zeros(shape, np.float32)
    out[crd[:, 0], crd[:, 1]] = val
    return out[..., None]


def _scale_intrinsics_np(K, sx, sy):
    K = np.copy(K)
    K[0, 0] *= sx
    K[1, 1] *= sy
    K[0, 2] *= sx
    K[1, 2] *= sy
    return K


def crop_sample(sample, borders):
    """Crop images, depths and intrinsics (train path)."""
    left, top, right, bottom = borders
    for key in ('rgb', 'rgb_original'):
        if key in sample:
            sample[key] = sample[key][top:bottom, left:right]
    for key in ('rgb_context', 'rgb_context_original'):
        if key in sample:
            sample[key] = [im[top:bottom, left:right] for im in sample[key]]
    for key in ('depth', 'input_depth', 'mask'):
        if key in sample and sample[key] is not None:
            sample[key] = sample[key][top:bottom, left:right]
    if 'intrinsics' in sample and np.asarray(sample['intrinsics']).shape == (3, 3):
        K = np.copy(sample['intrinsics'])
        K[0, 2] -= left
        K[1, 2] -= top
        sample['intrinsics'] = K
    if 'distortion_coeffs' in sample:
        dc = dict(sample['distortion_coeffs'])
        dc['ux'] = dc['ux'] - left
        dc['uy'] = dc['uy'] - top
        sample['distortion_coeffs'] = dc
    return sample


def crop_sample_input(sample, borders):
    """Crop only the model inputs, leaving eval GT depth full-size."""
    keep_depth = sample.pop('depth', None)
    sample = crop_sample(sample, borders)
    if keep_depth is not None:
        sample['depth'] = keep_depth
    return sample


def resize_sample(sample, shape):
    """Resize images + intrinsics + depths (train path)."""
    h, w = sample['rgb'].shape[:2]
    sx, sy = shape[1] / w, shape[0] / h
    if 'intrinsics' in sample and np.asarray(sample['intrinsics']).shape == (3, 3):
        sample['intrinsics'] = _scale_intrinsics_np(
            np.asarray(sample['intrinsics'], np.float32), sx, sy)
    if 'distortion_coeffs' in sample:
        dc = dict(sample['distortion_coeffs'])
        dc['ux'] = dc['ux'] * sx
        dc['uy'] = dc['uy'] * sy
        sample['distortion_coeffs'] = dc
    for key in ('rgb', 'rgb_original'):
        if key in sample:
            sample[key] = resize_image(sample[key], shape)
    for key in ('rgb_context', 'rgb_context_original'):
        if key in sample:
            sample[key] = [resize_image(im, shape) for im in sample[key]]
    for key in ('depth', 'input_depth'):
        if key in sample and sample[key] is not None:
            sample[key] = resize_depth_preserve(sample[key], shape)
    if 'mask' in sample and sample['mask'] is not None:
        sample['mask'] = resize_depth(sample['mask'], shape)
    return sample


def duplicate_sample(sample):
    """Keep un-jittered originals for the photometric loss."""
    sample['rgb_original'] = sample['rgb'].copy()
    if 'rgb_context' in sample:
        sample['rgb_context_original'] = [im.copy()
                                          for im in sample['rgb_context']]
    return sample


########################################################################################################################
# Color jitter (torchvision ColorJitter-equivalent factors, fixed order)


def _adjust_brightness(img, f):
    return np.clip(img * f, 0, 1)


def _adjust_contrast(img, f):
    mean = img.mean(axis=(0, 1), keepdims=True).mean()
    return np.clip((img - mean) * f + mean, 0, 1)


def _adjust_saturation(img, f):
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]
    return np.clip((img - gray) * f + gray, 0, 1)


def _adjust_hue(img, f):
    # cheap HSV hue rotation
    maxc = img.max(axis=-1)
    minc = img.min(axis=-1)
    v = maxc
    s = np.where(maxc > 0, (maxc - minc) / np.maximum(maxc, 1e-8), 0)
    rc = np.where(maxc > minc, (maxc - img[..., 0]) / np.maximum(maxc - minc, 1e-8), 0)
    gc = np.where(maxc > minc, (maxc - img[..., 1]) / np.maximum(maxc - minc, 1e-8), 0)
    bc = np.where(maxc > minc, (maxc - img[..., 2]) / np.maximum(maxc - minc, 1e-8), 0)
    h = np.where(img[..., 0] == maxc, bc - gc,
                 np.where(img[..., 1] == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = (h + f) % 1.0
    i = np.floor(h * 6.0)
    fr = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * fr)
    t = v * (1 - s * (1 - fr))
    i = i.astype(int) % 6
    conds = [i == k for k in range(6)]
    r = np.select(conds, [v, q, p, p, t, v])
    g = np.select(conds, [t, v, v, q, p, p])
    b = np.select(conds, [p, p, t, v, v, q])
    return np.clip(np.stack([r, g, b], axis=-1), 0, 1).astype(np.float32)


def colorjitter_sample(sample, parameters, rng=None):
    """Apply the SAME random jitter to target + context (reference parity)."""
    rng = rng or np.random
    b, c, s, h = parameters
    fb = rng.uniform(max(0, 1 - b), 1 + b)
    fc = rng.uniform(max(0, 1 - c), 1 + c)
    fs = rng.uniform(max(0, 1 - s), 1 + s)
    fh = rng.uniform(-h, h)

    def jitter(img):
        img = _adjust_brightness(img, fb)
        img = _adjust_contrast(img, fc)
        img = _adjust_saturation(img, fs)
        if h > 0:
            img = _adjust_hue(img, fh)
        return img.astype(np.float32)

    sample['rgb'] = jitter(sample['rgb'])
    if 'rgb_context' in sample:
        sample['rgb_context'] = [jitter(im) for im in sample['rgb_context']]
    return sample


########################################################################################################################
# Split pipelines (reference: datasets/transforms.py:21-105)


def train_transforms(sample, image_shape=(), jittering=(),
                     crop_train_borders=(), rng=None, advanced=None):
    if len(crop_train_borders) > 0:
        borders = parse_crop_borders(crop_train_borders,
                                     sample['rgb'].shape[:2])
        sample = crop_sample(sample, borders)
    if len(image_shape) > 0:
        sample = resize_sample(sample, tuple(image_shape))
    sample = duplicate_sample(sample)
    if len(jittering) > 0:
        sample = colorjitter_sample(sample, jittering, rng)
    if advanced:
        r = rng or np.random
        for aug in advanced:
            sample['rgb'] = aug(sample['rgb'], r)
    return sample


def validation_transforms(sample, image_shape=(), crop_eval_borders=()):
    if len(crop_eval_borders) > 0:
        borders = parse_crop_borders(crop_eval_borders,
                                     sample['rgb'].shape[:2])
        sample = crop_sample_input(sample, borders)
    if len(image_shape) > 0:
        shape = tuple(image_shape)
        sample['rgb'] = resize_image(sample['rgb'], shape)
        if 'rgb_context' in sample:
            sample['rgb_context'] = [resize_image(im, shape)
                                     for im in sample['rgb_context']]
        if 'input_depth' in sample:
            sample['input_depth'] = resize_depth_preserve(
                sample['input_depth'], shape)
        if 'mask' in sample and sample['mask'] is not None:
            sample['mask'] = resize_depth(sample['mask'], shape)
    return sample


def test_transforms(sample, image_shape=(), crop_eval_borders=()):
    if len(crop_eval_borders) > 0:
        borders = parse_crop_borders(crop_eval_borders,
                                     sample['rgb'].shape[:2])
        sample = crop_sample_input(sample, borders)
    if len(image_shape) > 0:
        shape = tuple(image_shape)
        sample['rgb'] = resize_image(sample['rgb'], shape)
        if 'rgb_context' in sample:
            sample['rgb_context'] = [resize_image(im, shape)
                                     for im in sample['rgb_context']]
        if 'input_depth' in sample:
            sample['input_depth'] = resize_depth(sample['input_depth'], shape)
    return sample


def get_transforms(mode, image_shape=(), jittering=(), crop_train_borders=(),
                   crop_eval_borders=(), augmentation=None, **kwargs):
    if mode == 'train':
        advanced = []
        if augmentation:
            ra = augmentation.get('randaugment', {})
            if ra.get('enabled', False):
                from packnet_sfm_tpu.datasets.augmentations_advanced import \
                    RandAugment
                advanced.append(RandAugment(ra.get('n', 2), ra.get('m', 0.5),
                                            ra.get('prob', 0.5)))
            re_ = augmentation.get('random_erasing', {})
            if re_.get('enabled', False):
                from packnet_sfm_tpu.datasets.augmentations_advanced import \
                    RandomErasing
                advanced.append(RandomErasing(
                    re_.get('probability', 0.1), re_.get('sl', 0.02),
                    re_.get('sh', 0.4), re_.get('r1', 0.3),
                    re_.get('mean', (0.485, 0.456, 0.406))))
        return lambda s: train_transforms(s, image_shape, jittering,
                                          crop_train_borders,
                                          advanced=advanced)
    if mode == 'validation':
        return lambda s: validation_transforms(s, image_shape,
                                               crop_eval_borders)
    if mode == 'test':
        return lambda s: test_transforms(s, image_shape, crop_eval_borders)
    raise ValueError('Unknown transform mode {}'.format(mode))
