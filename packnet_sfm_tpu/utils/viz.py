"""
Depth visualization: inverse-depth -> plasma colormap
(reference: utils/depth.py:66-100, visualization/colormaps.py).
Implemented without matplotlib (host-side numpy LUT).
"""

import numpy as np

# 16-stop plasma approximation (matplotlib plasma sampled)
_PLASMA = np.array([
    [0.050, 0.030, 0.528], [0.204, 0.017, 0.593], [0.312, 0.008, 0.636],
    [0.418, 0.001, 0.658], [0.516, 0.038, 0.648], [0.604, 0.110, 0.608],
    [0.682, 0.189, 0.548], [0.748, 0.266, 0.487], [0.807, 0.342, 0.428],
    [0.858, 0.423, 0.371], [0.903, 0.505, 0.313], [0.940, 0.592, 0.255],
    [0.967, 0.684, 0.195], [0.982, 0.781, 0.141], [0.980, 0.883, 0.125],
    [0.940, 0.975, 0.131]], np.float32)


def apply_colormap(x):
    """x in [0,1] [H,W] -> [H,W,3] plasma colors."""
    x = np.clip(x, 0.0, 1.0) * (len(_PLASMA) - 1)
    lo = np.floor(x).astype(int)
    hi = np.minimum(lo + 1, len(_PLASMA) - 1)
    w = (x - lo)[..., None]
    return _PLASMA[lo] * (1 - w) + _PLASMA[hi] * w


def viz_inv_depth(inv_depth, normalizer=None, percentile=95,
                  filter_zeros=False):
    """Colormapped inverse depth (reference: utils/depth.py:66-100)."""
    inv_depth = np.asarray(inv_depth)
    if inv_depth.ndim == 3:
        inv_depth = inv_depth[..., 0] if inv_depth.shape[-1] == 1 \
            else inv_depth[0]
    if normalizer is None:
        vals = inv_depth[inv_depth > 0] if filter_zeros else inv_depth
        normalizer = np.percentile(vals, percentile) if vals.size else 1.0
    return apply_colormap(inv_depth / (normalizer + 1e-6))
