"""Decoded-sample cache: correctness of ram/disk replay + the random-aug
safety guard (reference analogue: kitti_dataset_optimized.py:59-113)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from packnet_sfm_tpu.datasets.cache import SampleCache
from packnet_sfm_tpu.datasets.synthetic import SyntheticDataset


class CountingDataset:
    def __init__(self, n=4):
        self.inner = SyntheticDataset(num_samples=n, height=16, width=24)
        self.calls = 0

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, idx):
        self.calls += 1
        return self.inner[idx]


@pytest.mark.parametrize('mode', ['ram', 'disk'])
def test_cache_replays_identically(mode, tmp_path):
    ds = CountingDataset()
    cached = SampleCache(ds, mode=mode, cache_dir=str(tmp_path))
    first = [cached[i] for i in range(len(cached))]
    assert ds.calls == len(cached)
    second = [cached[i] for i in range(len(cached))]
    assert ds.calls == len(cached)  # no re-decode
    for a, b in zip(first, second):
        assert set(a) == set(b)
        np.testing.assert_array_equal(a['rgb'], b['rgb'])
        np.testing.assert_array_equal(a['depth'], b['depth'])


def test_validate_transform_guard():
    from packnet_sfm_tpu.config import get_cfg_defaults
    cfg = get_cfg_defaults()
    aug = cfg.datasets.augmentation
    aug.jittering = (0.2, 0.2, 0.2, 0.05)
    assert not SampleCache.validate_transform(aug, device_augment=False)
    assert SampleCache.validate_transform(aug, device_augment=True)
    aug.jittering = ()
    assert SampleCache.validate_transform(aug, device_augment=False)
    aug.randaugment.enabled = True
    assert not SampleCache.validate_transform(aug, device_augment=True)
