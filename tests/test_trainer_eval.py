"""Trainer evaluation protocol: quick-eval RGB vs RGB+LiDAR and metric modes."""

import numpy as np
import pytest

import jax

from packnet_sfm_tpu.config import parse_train_config
from packnet_sfm_tpu.trainers.trainer import Trainer, _to_device_batch


@pytest.fixture(scope='module')
def trainer_with_lidar():
    cfg = parse_train_config('configs/overfit_synthetic.yaml')
    cfg.arch.max_epochs = 1
    cfg.datasets.train.input_depth_type = ['sparse']   # synthetic lidar on
    cfg.datasets.validation.input_depth_type = ['sparse']
    cfg.model.depth_net.use_film = True
    trainer = Trainer(cfg)
    loader = trainer._make_loader('validation')
    first = next(iter(loader))
    trainer._steps_per_epoch = 4
    trainer.setup(_to_device_batch(first, trainer.mesh))
    return trainer, loader


def test_validate_produces_all_modes(trainer_with_lidar):
    trainer, loader = trainer_with_lidar
    metrics = trainer.validate(loader)
    for mode in ['depth', 'depth_gt', 'depth_lin', 'depth_lin_gt',
                 'depth_log', 'depth_log_gt']:
        assert '{}-abs_rel'.format(mode) in metrics, mode
    assert np.isfinite(metrics['depth-abs_rel'])


def test_quick_eval_runs(trainer_with_lidar, capsys):
    trainer, loader = trainer_with_lidar
    trainer.quick_eval(loader, 2, 10)
    out = capsys.readouterr().out
    assert 'abs_rel RGB' in out
    assert 'RGB+LiDAR' in out  # synthetic samples carry input_depth


def test_validate_skips_failing_batches(trainer_with_lidar, capsys):
    """Per-batch failure resilience (reference model_wrapper.py:358-365):
    a batch that fails mid-epoch is warned and skipped, the rest still
    score; an epoch where EVERY batch fails raises instead of reporting
    empty metrics."""
    trainer, loader = trainer_with_lidar

    class FlakyLoader:
        """Wraps the real loader; poisons selected batch indices with a
        host decode error."""
        def __init__(self, inner, poison):
            self.inner, self.poison = inner, poison

        def __iter__(self):
            def gen():
                for i, batch in enumerate(self.inner):
                    if i in self.poison:
                        yield None  # _to_device_batch raises on this
                    else:
                        yield batch
            return gen()

    metrics = trainer.validate(FlakyLoader(loader, {0}))
    out = capsys.readouterr().out
    assert 'warning: validation batch' in out
    assert np.isfinite(metrics['depth-abs_rel'])

    with pytest.raises(RuntimeError, match='all .* validation batches'):
        trainer.validate(FlakyLoader(loader, set(range(100))))


def test_flip_tta_eval(trainer_with_lidar):
    trainer, loader = trainer_with_lidar
    trainer.config.model.params.flip_tta = True
    try:
        metrics = trainer.validate(loader)
        assert np.isfinite(metrics['depth-abs_rel'])
    finally:
        trainer.config.model.params.flip_tta = False


def test_progressive_precision_switch(tmp_path):
    """bf16 photometric switches to fp32 at the configured progress."""
    from packnet_sfm_tpu.config import parse_train_config
    from packnet_sfm_tpu.trainers.trainer import Trainer
    cfg = parse_train_config('configs/overfit_synthetic.yaml')
    cfg.arch.max_epochs = 2
    cfg.tpu.photometric_dtype = 'bfloat16'
    cfg.tpu.photometric_fp32_progress = 0.5  # switch at epoch 1
    cfg.model.loss.supervised_loss_weight = 0.9
    trainer = Trainer(cfg)
    trainer.fit()
    assert trainer._precision_switched
    assert trainer.config.tpu.photometric_dtype == 'float32'


def test_precision_switch_keeps_augment_and_static_progress():
    """Regression: the precision-switch rebuild must pass the SAME kwargs as
    setup() — before the fix it dropped augment_fn (on-device jitter silently
    stopped) and static_progress (ProgressiveScaling then raised on a traced
    progress in the first post-switch step)."""
    cfg = parse_train_config('configs/overfit_synthetic.yaml')
    cfg.arch.max_epochs = 3
    cfg.tpu.photometric_dtype = 'bfloat16'
    cfg.tpu.photometric_fp32_progress = 0.4     # switch at epoch 2
    cfg.tpu.device_augment = True
    cfg.datasets.augmentation.jittering = (0.2, 0.2, 0.2, 0.05)
    cfg.model.loss.supervised_loss_weight = 0.9
    cfg.model.loss.progressive_scaling = 0.3
    trainer = Trainer(cfg)
    trainer.fit()                                # raises before the fix
    assert trainer._precision_switched
    assert trainer._augment_fn is not None


def test_multi_dataset_validation(capsys):
    """Two validation datasets validate SEPARATELY: per-dataset prefixed
    metrics plus the monitor_index dataset's metrics unprefixed (reference:
    horovod_trainer per-dataset eval; checkpoint.monitor_index,
    utils/config.py:91,244)."""
    cfg = parse_train_config('configs/overfit_synthetic.yaml')
    cfg.arch.max_epochs = 1
    cfg.datasets.validation.dataset = ['Synthetic', 'Synthetic']
    cfg.datasets.validation.path = ['', '']
    cfg.datasets.validation.split = ['4', '6']
    cfg.datasets.validation.input_depth_type = ['', 'sparse']
    cfg.checkpoint.monitor_index = 1
    trainer = Trainer(cfg)
    val_loaders = trainer._make_val_loaders()
    assert len(val_loaders) == 2
    assert val_loaders[0][0] != val_loaders[1][0]  # distinct prefixes
    first = next(iter(val_loaders[0][1]))
    trainer._steps_per_epoch = 4
    trainer.setup(_to_device_batch(first, trainer.mesh))
    metrics = trainer.validate_multi(val_loaders)
    p0, p1 = val_loaders[0][0], val_loaders[1][0]
    assert '{}/depth-abs_rel'.format(p0) in metrics
    assert '{}/depth-abs_rel'.format(p1) in metrics
    # unprefixed keys mirror the monitored dataset (index 1)
    assert metrics['depth-abs_rel'] == metrics[
        '{}/depth-abs_rel'.format(p1)]
    out = capsys.readouterr().out
    assert out.count('Validation epoch') == 2
