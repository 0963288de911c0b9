"""Advanced augmentation tests."""

import pytest

import numpy as np

from packnet_sfm_tpu.datasets.augmentations_advanced import (
    RandAugment, RandomErasing, mixup_batch, cutmix_batch,
    make_advanced_collate)
from packnet_sfm_tpu.datasets.loader import default_collate

pytestmark = pytest.mark.quick



def test_randaugment_valid_range():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 24, 3).astype(np.float32)
    aug = RandAugment(n=3, m=0.7, prob=1.0)
    out = aug(img, rng)
    assert out.shape == img.shape
    assert out.min() >= 0 and out.max() <= 1
    assert not np.allclose(out, img)


def test_random_erasing_erases():
    rng = np.random.RandomState(1)
    img = np.ones((32, 32, 3), np.float32)
    out = RandomErasing(probability=1.0)(img, rng)
    assert (out != 1.0).any()


def test_mixup_preserves_depth():
    rng = np.random.RandomState(2)
    batch = {'rgb': rng.rand(4, 8, 8, 3).astype(np.float32),
             'depth': rng.rand(4, 8, 8, 1).astype(np.float32)}
    depth_before = batch['depth'].copy()
    out = mixup_batch(dict(batch), alpha=0.2, prob=1.0, rng=rng)
    np.testing.assert_array_equal(out['depth'], depth_before)
    assert not np.allclose(out['rgb'], batch['rgb'])


def test_cutmix_moves_depth_patch():
    rng = np.random.RandomState(3)
    batch = {'rgb': rng.rand(4, 16, 16, 3).astype(np.float32),
             'depth': rng.rand(4, 16, 16, 1).astype(np.float32)}
    out = cutmix_batch({k: v.copy() for k, v in batch.items()},
                       alpha=1.0, prob=1.0, rng=rng)
    assert out['rgb'].shape == batch['rgb'].shape


def test_advanced_collate():
    rng = np.random.RandomState(4)
    samples = [{'rgb': rng.rand(8, 8, 3).astype(np.float32)}
               for _ in range(4)]
    cfg = {'mixup': {'enabled': True, 'alpha': 0.2, 'prob': 1.0},
           'cutmix': {'enabled': False}}
    collate = make_advanced_collate(cfg, default_collate, seed=0)
    batch = collate(samples)
    assert batch['rgb'].shape == (4, 8, 8, 3)
