"""
Host-side data loader: sharded, batched, prefetched.

Replaces the reference's DataLoader + DistributedSampler stack
(reference: model_wrapper.py:1138-1216): the index space is sharded by
jax.process_index() (the DistributedSampler equivalent), batches are collated
into stacked numpy arrays (static shapes — train uses drop_last=True so XLA
never recompiles; eval may pass drop_last=False and pay at most one ragged
final-batch compile), and a background thread keeps `prefetch` batches ahead of the
device. Worker parallelism uses a thread pool (decode is numpy/PIL which
releases the GIL); the C++ decode path (csrc/) slots in underneath.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def default_collate(samples):
    """Stack a list of sample dicts into a batch dict of arrays."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        v0 = vals[0]
        if isinstance(v0, dict):
            out[key] = default_collate(vals)
        elif isinstance(v0, (list, tuple)):
            out[key] = [np.stack([v[i] for v in vals])
                        for i in range(len(v0))]
        elif isinstance(v0, np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(v0, (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals  # strings / paths ride along
    return out


class DataLoader:
    def __init__(self, dataset, batch_size, shuffle=False, seed=42,
                 num_workers=4, prefetch=2, drop_last=True,
                 shard_index=0, num_shards=1, collate_fn=None, repeat=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.collate_fn = collate_fn or default_collate
        self.repeat = repeat
        self.epoch = 0

    def set_epoch(self, epoch):
        """Reshuffle per epoch (DistributedSampler.set_epoch equivalent)."""
        self.epoch = epoch
        self._consumed = 0

    # -- deterministic mid-epoch resume --------------------------------------
    def state_dict(self):
        """Position for exact resume: shuffles are keyed by (seed, epoch), so
        (epoch, batches consumed) replays deterministically."""
        return {'epoch': self.epoch,
                'batches_consumed': getattr(self, '_consumed', 0)}

    def load_state_dict(self, state):
        self.epoch = int(state.get('epoch', 0))
        self._skip = int(state.get('batches_consumed', 0))

    def _indices(self):
        import os
        n = len(self.dataset)
        # debug sample-limit escape hatch
        # (reference: model_wrapper.py:1170-1186 FORCE_LIMITS)
        limit = int(os.environ.get('FORCE_DATASET_LIMIT', '0') or 0)
        if limit > 0:
            n = min(n, limit)
        idx = np.arange(n)
        if self.repeat > 1:
            idx = np.tile(idx, self.repeat)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-process shard (reference: DistributedSampler rank/world_size).
        # Every shard is truncated to the common floor length: in multi-host
        # SPMD each process must run the SAME number of steps or the
        # collectives deadlock (DistributedSampler pads instead; truncation
        # keeps batches real at the cost of <num_shards leftover samples,
        # which the per-epoch reshuffle rotates).
        shard = idx[self.shard_index::self.num_shards]
        if self.num_shards > 1:
            shard = shard[:len(idx) // self.num_shards]
        return shard

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def __iter__(self):
        indices = self._indices()
        nb = len(self)
        start = getattr(self, '_skip', 0)
        self._skip = 0
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(start, nb):
                    chunk = indices[b * self.batch_size:(b + 1) * self.batch_size]
                    samples = list(pool.map(self.dataset.__getitem__, chunk))
                    q.put(self.collate_fn(samples))
            q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        self._consumed = start
        while True:
            item = q.get()
            if item is sentinel:
                break
            self._consumed += 1
            yield item
