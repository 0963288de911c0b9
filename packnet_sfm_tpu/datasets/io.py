"""
Image / depth file IO (host side, numpy HWC float32).

Semantics from the reference (utils/image.py:12-26, utils/depth.py:13-62):
- RGB loaded as float32 in [0,1]
- 16-bit PNG depth maps divided by 256
- .npz depth under the 'depth' key

A C++ fast path (csrc/pngio) is used when built; PIL is the fallback.
"""

import numpy as np

try:
    from packnet_sfm_tpu.datasets import cpp_io as _cpp
except Exception:  # pragma: no cover - optional native extension
    _cpp = None


def load_image(path):
    """RGB image as float32 [H,W,3] in [0,1].

    PIL (libpng/zlib C) is preferred: measured 72 img/s vs 47 img/s for
    csrc/pngio's from-scratch inflate on full-size KITTI frames
    (scripts/bench_loader.py); the native decoder remains the fallback for
    PIL-less environments."""
    try:
        from PIL import Image
        img = Image.open(path).convert('RGB')
        return np.asarray(img, np.float32) / 255.0
    except ImportError:
        pass
    if _cpp is not None and path.endswith('.png'):
        arr = _cpp.decode_png(path)
        if arr is not None:
            if arr.ndim == 2:
                arr = np.repeat(arr[..., None], 3, axis=2)
            if arr.shape[2] == 4:
                arr = arr[..., :3]
            return arr.astype(np.float32) / 255.0
    raise RuntimeError('no PNG decoder available for {}'.format(path))


def load_depth(path):
    """Depth map [H,W] float32; invalid pixels are 0."""
    if path.endswith('.npz'):
        return np.load(path)['depth'].astype(np.float32)
    if path.endswith('.png'):
        if _cpp is not None:
            arr = _cpp.decode_png16(path)
            if arr is not None:
                assert arr.max() > 255, 'Wrong .png depth file'
                return arr.astype(np.float32) / 256.0
        from PIL import Image
        depth_png = np.asarray(Image.open(path), dtype=int)
        assert np.max(depth_png) > 255, 'Wrong .png depth file'
        return depth_png.astype(np.float32) / 256.0
    raise NotImplementedError('Depth extension not supported: ' + path)


def write_depth(path, depth, intrinsics=None):
    """Save depth as .npz (with intrinsics) or 16-bit-scaled .png."""
    if path.endswith('.npz'):
        np.savez_compressed(path, depth=depth, intrinsics=intrinsics)
    elif path.endswith('.png'):
        from PIL import Image
        Image.fromarray((depth * 256).astype(np.int32), mode='I').save(path)
    else:
        raise NotImplementedError('Depth filename not valid: ' + path)


def write_image(path, image):
    from PIL import Image
    arr = np.clip(image * 255, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
