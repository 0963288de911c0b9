"""End-to-end NCDB (fisheye) training over a synthetic fixture tree —
the flagship supervised-completion config path (reference:
train_resnet_san_ncdb_640x384.yaml semantics at toy scale)."""

import numpy as np

from tests.test_datasets import make_ncdb_tree
from packnet_sfm_tpu.config import parse_train_config
from packnet_sfm_tpu.trainers.trainer import Trainer


def test_ncdb_completion_train_one_epoch(tmp_path):
    root = make_ncdb_tree(str(tmp_path))
    cfg = parse_train_config('configs/train_resnet_san_ncdb_640x384.yaml')
    for split in ('train', 'validation', 'test'):
        node = cfg.datasets[split]
        node.path = [root] * max(1, len(node.path))
        node.split = ['split.json'] * max(1, len(node.split))
        node.batch_size = 2
        node.num_workers = 1
        node.input_depth_type = ['depth_original'] * max(
            1, len(node.input_depth_type))
    cfg.datasets.augmentation.image_shape = (32, 64)
    cfg.arch.max_epochs = 1
    cfg.arch.eval_during_training = False
    cfg.checkpoint.filepath = ''
    cfg.tpu.compute_dtype = 'float32'  # CPU test
    trainer = Trainer(cfg)
    trainer.fit()
    metrics = trainer.validate(trainer._make_loader('validation'))
    assert np.isfinite(metrics['depth-abs_rel'])
    # SAN/FiLM branch really engaged: fusion gates exist in params
    assert 'mconvs' in trainer.state.params['depth_net']
