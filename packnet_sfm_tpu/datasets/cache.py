"""
Decoded-sample cache: decode/transform once, then serve samples at memory
or disk bandwidth instead of PNG-inflate rate.

The TPU analogue of the reference's host-side caching tricks
(reference: datasets/kitti_dataset_optimized.py:59-113 file-cache in /tmp,
:394-442 ProcessPoolExecutor) — on a 1-core loader host the steady-state
input rate must not be bound by zlib, so epoch 1 pays the decode and every
later epoch replays raw arrays:

- 'ram':  samples pinned in process memory (fastest; bounded by host RAM —
          a 192x640 KITTI sample with contexts is ~2-3 MB, so ~20k samples
          fit in 64 GB)
- 'disk': one .npy blob per sample under cache_dir (survives restarts,
          ~disk-bandwidth replay)

Correctness guard: caching freezes the sample, so it must NOT wrap a
transform with per-epoch host-side randomness. The trainer only enables it
when jitter runs on-device (tpu.device_augment) or the split has no random
augmentation; `SampleCache.validate_transform` enforces this.
"""

import os

import numpy as np


class SampleCache:
    def __init__(self, dataset, mode='ram', cache_dir=None):
        assert mode in ('ram', 'disk'), mode
        self.dataset = dataset
        self.mode = mode
        if mode == 'disk':
            self.cache_dir = cache_dir or os.path.join(
                '/tmp', 'packnet_sfm_tpu_cache',
                '{}_{}'.format(type(dataset).__name__, len(dataset)))
            os.makedirs(self.cache_dir, exist_ok=True)
        self._ram = {}

    @staticmethod
    def validate_transform(aug_cfg, device_augment):
        """True when caching is semantically safe for the train split."""
        jitter = tuple(aug_cfg.get('jittering', ()) or ())
        if jitter and not device_augment:
            return False
        # per-sample host-side random augs freeze under the cache
        # (mixup/cutmix are collate-level and stay random)
        if any(aug_cfg.get(k, {}).get('enabled', False)
               for k in ('randaugment', 'random_erasing')):
            return False
        return True

    def __len__(self):
        return len(self.dataset)

    def _disk_path(self, idx):
        return os.path.join(self.cache_dir, '{}.npy'.format(idx))

    def __getitem__(self, idx):
        if self.mode == 'ram':
            s = self._ram.get(idx)
            if s is None:
                s = self.dataset[idx]
                self._ram[idx] = s
            return s
        path = self._disk_path(idx)
        if os.path.exists(path):
            try:
                return np.load(path, allow_pickle=True).item()
            except Exception:
                pass  # partial write from a crashed run; re-decode
        s = self.dataset[idx]
        tmp = path + '.tmp{}'.format(os.getpid())
        with open(tmp, 'wb') as f:
            np.save(f, np.asarray(s, dtype=object), allow_pickle=True)
        os.replace(tmp, path)
        return s
