"""Mid-epoch checkpoint + exact resume.

checkpoint.save_every_n_steps > 0 writes a rolling mid_epoch.ckpt carrying
the loader position; resuming from it replays the (seed, epoch)-keyed
shuffle, skips the consumed batches, and fast-forwards the per-step rng —
so the resumed run continues from the exact batch (TPU-native addition;
the reference only checkpoints at epoch end, models/model_checkpoint.py).
"""

import os

import numpy as np

from packnet_sfm_tpu.config import parse_train_config
from packnet_sfm_tpu.trainers.trainer import Trainer
from packnet_sfm_tpu.utils.checkpoint import load_checkpoint


def test_midepoch_save_and_exact_resume(tmp_path, monkeypatch):
    cfg = parse_train_config('configs/overfit_synthetic.yaml')
    cfg.arch.max_epochs = 1
    cfg.datasets.validation.dataset = []  # keep the test train-only
    cfg.checkpoint.filepath = str(tmp_path / 'ckpts' / 'model_{epoch:02d}')
    cfg.checkpoint.save_every_n_steps = 3  # 4 batches/epoch -> saved at b=3

    # the trainer deletes the stale mid_epoch.ckpt once its epoch completes
    # (round-2 ADVICE); capture the payload at deletion time to verify what
    # an interrupted run would have resumed from
    captured = {}
    real_remove = os.remove

    def capturing_remove(path):
        if str(path).endswith('mid_epoch.ckpt'):
            captured['payload'] = load_checkpoint(path)
        real_remove(path)

    monkeypatch.setattr(os, 'remove', capturing_remove)

    trainer = Trainer(cfg)
    trainer.fit()
    assert int(trainer.state.step) == 4  # 8 samples, bs2, drop_last

    mid = str(tmp_path / 'ckpts' / 'mid_epoch.ckpt')
    assert not os.path.exists(mid), \
        'stale mid_epoch.ckpt must be removed at epoch end'
    payload = captured['payload']
    assert payload['loader'] == {'epoch': 0, 'batches_consumed': 3}
    assert payload['step'] == 3

    # resume: must run exactly the 1 remaining batch of epoch 0
    cfg2 = parse_train_config('configs/overfit_synthetic.yaml')
    cfg2.arch.max_epochs = 1
    cfg2.datasets.validation.dataset = []
    cfg2.checkpoint.filepath = str(tmp_path / 'ckpts2' / 'model_{epoch:02d}')
    trainer2 = Trainer(cfg2, resume_state=payload)
    trainer2.fit()
    assert int(trainer2.state.step) == 4

    # the resumed parameters end up finite and actually moved
    p0 = payload['params']
    p1 = trainer2.state.params
    import jax
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)))
    assert np.isfinite(moved) and moved > 0
