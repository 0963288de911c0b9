"""End-to-end KITTI config training over a synthetic on-disk KITTI tree —
the overfit_kitti.yaml smoke-test role (SURVEY.md §4) without real data."""

import os

import numpy as np
import pytest

from tests.test_datasets import make_kitti_tree
from packnet_sfm_tpu.config import parse_train_config
from packnet_sfm_tpu.trainers.trainer import Trainer


def test_kitti_selfsup_train_one_epoch(tmp_path):
    root = make_kitti_tree(str(tmp_path))
    cfg = parse_train_config('configs/overfit_kitti.yaml')
    for split in ('train', 'validation', 'test'):
        node = cfg.datasets[split]
        node.path = [root] * len(node.path)
        node.split = ['split.txt'] * len(node.split)
        node.depth_type = ['groundtruth'] * len(node.depth_type)
        node.batch_size = 2
        node.num_workers = 1
    cfg.datasets.train.repeat = [2]
    cfg.datasets.augmentation.image_shape = (32, 64)
    cfg.arch.max_epochs = 1
    cfg.arch.eval_during_training = False
    # 18pt -> pretrained loader runs its graceful no-weights path
    trainer = Trainer(cfg)
    trainer.fit()
    metrics = trainer.validate(trainer._make_loader('validation'))
    assert 'depth-abs_rel' in metrics
    assert np.isfinite(metrics['depth-abs_rel'])
