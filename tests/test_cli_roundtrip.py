"""
Full CLI roundtrip: train (with checkpointing) -> resume parse -> eval from
checkpoint -> torch-mirror export. The framework-level integration test.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.config import parse_train_config, parse_test_file
from packnet_sfm_tpu.trainers.trainer import Trainer, _to_device_batch


@pytest.fixture(scope='module')
def trained_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('run')
    cfg = parse_train_config('configs/overfit_synthetic.yaml')
    cfg.arch.max_epochs = 1
    cfg.checkpoint.filepath = str(tmp / 'ckpts')
    cfg.checkpoint.monitor = 'loss'
    from packnet_sfm_tpu.config.config import prepare_config
    cfg.prepared = False
    cfg = prepare_config(cfg)
    trainer = Trainer(cfg)
    trainer.fit()
    ckpts = [os.path.join(root, f)
             for root, _, files in os.walk(str(tmp))
             for f in files if f.endswith('.ckpt')]
    assert ckpts, 'no checkpoint written'
    return ckpts[0]


def test_eval_from_checkpoint(trained_ckpt):
    config, state = parse_test_file(trained_ckpt)
    assert state['epoch'] == 0
    config.datasets.test = config.datasets.validation.clone()
    trainer = Trainer(config, resume_state=state)
    loader = trainer._make_loader('test')
    first = next(iter(loader))
    trainer._steps_per_epoch = 1
    trainer.setup(_to_device_batch(first, trainer.mesh))
    metrics = trainer.test(loader)
    assert 'depth-abs_rel' in metrics
    assert np.isfinite(metrics['depth-abs_rel'])


def test_resume_training_from_checkpoint(trained_ckpt):
    from packnet_sfm_tpu.config import parse_train_file
    config, state = parse_train_file(trained_ckpt)
    assert state is not None
    assert config.model.name == 'SemiSupCompletionModel'
    config.arch.max_epochs = 2  # resume for one more epoch
    config.checkpoint.filepath = ''
    trainer = Trainer(config, resume_state=state)
    trainer.fit()
    assert int(trainer.current_epoch) == 1


def test_eval_save_outputs(trained_ckpt, tmp_path):
    """cfg.save-driven eval dump (reference: utils/save.py save_depth):
    test() writes <folder>/depth/<dataset>/<ckpt>/<name>_{depth.npz,
    depth.png,rgb.png,viz.png} per save.depth flags."""
    import glob
    config, state = parse_test_file(trained_ckpt)
    config.datasets.test = config.datasets.validation.clone()
    config.save.folder = str(tmp_path / 'dumps')
    trainer = Trainer(config, resume_state=state)
    loader = trainer._make_loader('test')
    first = next(iter(loader))
    trainer._steps_per_epoch = 1
    trainer.setup(_to_device_batch(first, trainer.mesh))
    trainer.test(loader)
    npzs = glob.glob(str(tmp_path / 'dumps' / 'depth' / '**' / '*_depth.npz'),
                     recursive=True)
    assert npzs, 'no npz dumps written'
    stem = npzs[0][:-len('_depth.npz')]
    for suffix in ('_depth.png', '_rgb.png', '_viz.png'):
        assert os.path.exists(stem + suffix), suffix
    d = np.load(npzs[0])['depth']
    assert d.ndim == 2 and np.isfinite(d).all() and (d > 0).all()
