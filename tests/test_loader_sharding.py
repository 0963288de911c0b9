"""Multi-host loader sharding (round-3 VERDICT weak #5): the per-process
shards must be disjoint, cover the dataset, keep EVERY process on the same
step count (SPMD lockstep — unequal lengths deadlock collectives), and
reshuffle across epochs. Mirrors torch DistributedSampler semantics
(reference: model_wrapper.py setup_dataloader worldsize/rank wiring) with
truncation instead of padding.
"""

import numpy as np
import pytest

from packnet_sfm_tpu.datasets.loader import DataLoader

pytestmark = pytest.mark.quick


class _IdxDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {'idx': np.asarray(i)}


def _shard_indices(loader):
    out = []
    for batch in loader:
        out.extend(int(v) for v in batch['idx'])
    return out


@pytest.mark.parametrize('n,k,bs', [(64, 4, 4), (67, 4, 4), (10, 3, 1),
                                    (128, 8, 8)])
def test_shards_disjoint_equal_and_covering(n, k, bs):
    loaders = [DataLoader(_IdxDataset(n), batch_size=bs, shuffle=True,
                          seed=11, num_workers=1, shard_index=i, num_shards=k)
               for i in range(k)]
    for ld in loaders:
        ld.set_epoch(0)
    seen = [_shard_indices(ld) for ld in loaders]
    # identical step count on every process (lockstep requirement)
    assert len({len(ld) for ld in loaders}) == 1
    assert len({len(s) for s in seen}) == 1
    # disjoint
    all_idx = [i for s in seen for i in s]
    assert len(all_idx) == len(set(all_idx))
    # covering: everything except < k + k*bs leftovers (shard floor + ragged
    # final batch under drop_last)
    assert len(all_idx) > n - k - k * bs
    assert set(all_idx) <= set(range(n))


def test_reshuffle_rotates_shard_assignment():
    n, k = 40, 4
    a = DataLoader(_IdxDataset(n), batch_size=2, shuffle=True, seed=3,
                   num_workers=1, shard_index=0, num_shards=k)
    a.set_epoch(0)
    e0 = _shard_indices(a)
    a.set_epoch(1)
    e1 = _shard_indices(a)
    assert e0 != e1, 'epoch reshuffle must change the shard'
    # over a few epochs the union of shard-0 draws should exceed one shard
    union = set(e0) | set(e1)
    for ep in range(2, 6):
        a.set_epoch(ep)
        union |= set(_shard_indices(a))
    assert len(union) > n // k + 2


def test_single_shard_unchanged():
    n = 13
    ld = DataLoader(_IdxDataset(n), batch_size=1, shuffle=False,
                    num_workers=1, shard_index=0, num_shards=1)
    ld.set_epoch(0)
    assert _shard_indices(ld) == list(range(n))


def test_midepoch_resume_consistent_across_shards():
    """After a resume skip, shards stay disjoint and aligned."""
    n, k, bs = 48, 2, 4
    loaders = [DataLoader(_IdxDataset(n), batch_size=bs, shuffle=True,
                          seed=5, num_workers=1, shard_index=i, num_shards=k)
               for i in range(k)]
    full = []
    for ld in loaders:
        ld.set_epoch(2)
        full.append(_shard_indices(ld))
    resumed = []
    for ld in loaders:
        ld.set_epoch(2)
        ld.load_state_dict({'epoch': 2, 'batches_consumed': 3})
        resumed.append(_shard_indices(ld))
    for f, r in zip(full, resumed):
        assert f[3 * bs:] == r
