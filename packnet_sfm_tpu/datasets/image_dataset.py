"""
ImageDataset: plain image-folder reader with dummy intrinsics
(reference: packnet_sfm/datasets/image_dataset.py:14-60).
"""

import os
import glob

import numpy as np

from packnet_sfm_tpu.datasets.io import load_image

EXTENSIONS = ('.png', '.jpg', '.jpeg', '.bmp')


def dummy_intrinsics(w, h):
    """Dummy calibration (reference: image_dataset.py:24-31)."""
    return np.array([[1000., 0., w / 2. - 0.5],
                     [0., 1000., h / 2. - 0.5],
                     [0., 0., 1.]], np.float32)


class ImageDataset:
    def __init__(self, path, split='', transform=None,
                 back_context=0, forward_context=0, strides=(1,), **kwargs):
        self.path = path
        self.transform = transform
        self.back_context = back_context
        self.forward_context = forward_context
        files = []
        if split and os.path.isfile(os.path.join(path, split)):
            with open(os.path.join(path, split)) as f:
                files = [os.path.join(path, l.strip()) for l in f
                         if l.strip()]
        else:
            for ext in EXTENSIONS:
                files += glob.glob(os.path.join(path, '*' + ext))
            files.sort()
        self.files = files

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        rgb = load_image(self.files[idx])
        h, w = rgb.shape[:2]
        sample = {
            'idx': idx,
            'filename': os.path.splitext(os.path.basename(self.files[idx]))[0],
            'rgb': rgb,
            'intrinsics': dummy_intrinsics(w, h),
        }
        if self.back_context or self.forward_context:
            ctx = []
            for off in range(-self.back_context, self.forward_context + 1):
                if off == 0:
                    continue
                j = min(max(idx + off, 0), len(self.files) - 1)
                ctx.append(load_image(self.files[j]))
            sample['rgb_context'] = ctx
        if self.transform:
            sample = self.transform(sample)
        return sample
