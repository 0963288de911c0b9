"""
Integration: jitted train step, overfit convergence, 8-device data-parallel
training on the forced-CPU mesh (the reference's smoke-test role of
overfit_kitti.yaml — SURVEY.md §4), and checkpoint round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.config import get_cfg_defaults
from packnet_sfm_tpu.models import setup_model
from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state
from packnet_sfm_tpu.parallel.train_step import (
    make_optimizer, make_train_step, make_eval_step, init_state)
from packnet_sfm_tpu.datasets.synthetic import SyntheticDataset
from packnet_sfm_tpu.datasets.loader import DataLoader
from packnet_sfm_tpu.utils.checkpoint import save_checkpoint, load_checkpoint


def small_cfg():
    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupCompletionModel'
    cfg.model.depth_net.name = 'ResNetSAN01'
    cfg.model.depth_net.version = '18A'
    cfg.model.pose_net.name = 'PoseNet'
    cfg.model.params.min_depth = 0.5
    cfg.model.params.max_depth = 15.0
    cfg.model.loss.supervised_method = 'sparse-l1'
    cfg.model.loss.supervised_loss_weight = 0.9
    cfg.model.loss.smooth_loss_weight = 0.001
    return cfg


def to_jnp(batch):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, batch)


def test_overfit_loss_decreases():
    """Loss must drop substantially when overfitting a tiny fixed batch."""
    cfg = small_cfg()
    model = setup_model(cfg)
    ds = SyntheticDataset(num_samples=2, height=32, width=64)
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    batch = to_jnp(next(iter(loader)))
    batch.pop('idx')

    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                               steps_per_epoch=100)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, donate=False)

    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), 0.0)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses


def test_data_parallel_8devices_matches_semantics():
    """DP on the 8-CPU mesh: runs, stays finite, and state stays replicated."""
    assert len(jax.devices()) == 8
    cfg = small_cfg()
    model = setup_model(cfg)
    ds = SyntheticDataset(num_samples=8, height=32, width=64)
    loader = DataLoader(ds, batch_size=8, num_workers=2)
    batch = to_jnp(next(iter(loader)))
    batch.pop('idx')

    mesh = make_mesh()
    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 10)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    state = replicate_state(state, mesh)
    sharded = shard_batch(batch, mesh)
    step = make_train_step(model, optimizer, mesh=mesh, donate=False)
    state2, metrics = step(state, sharded, jax.random.PRNGKey(1), 0.0)
    assert np.isfinite(float(metrics['loss']))
    # params remain replicated (no silent resharding)
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_cfg()
    model = setup_model(cfg)
    ds = SyntheticDataset(num_samples=2, height=32, width=64)
    batch = to_jnp(next(iter(DataLoader(ds, batch_size=2, num_workers=1))))
    batch.pop('idx')
    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 10)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(1), 0.0)

    path = str(tmp_path / 'test.ckpt')
    save_checkpoint(path, cfg, state, epoch=3)
    payload = load_checkpoint(path)
    assert payload['epoch'] == 3
    assert payload['config']['model']['name'] == 'SemiSupCompletionModel'
    # params round-trip exactly
    orig = jax.tree_util.tree_leaves(jax.device_get(state.params))
    rest = jax.tree_util.tree_leaves(payload['params'])
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_step():
    cfg = small_cfg()
    model = setup_model(cfg)
    ds = SyntheticDataset(num_samples=2, height=32, width=64)
    batch = to_jnp(next(iter(DataLoader(ds, batch_size=2, num_workers=1))))
    batch.pop('idx')
    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 10)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    out = make_eval_step(model)(state, batch)
    assert out['inv_depths'][0].shape == (2, 32, 64, 1)


def test_progressive_scaling_trains_with_static_progress():
    """progressive_scaling > 0 drops scales over progress and trains
    (static-progress jit path; at most num_scales recompiles)."""
    cfg = small_cfg()
    cfg.model.name = 'SelfSupModel'
    cfg.model.loss.progressive_scaling = 0.3  # 4->3->2->1 scales
    model = setup_model(cfg)
    ds = SyntheticDataset(num_samples=2, height=32, width=64)
    batch = to_jnp(next(iter(DataLoader(ds, batch_size=2, num_workers=1))))
    batch.pop('idx')
    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 10)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, donate=False,
                           static_progress=True)
    for progress in [0.0, 0.35, 0.65, 0.95]:
        state, metrics = step(state, batch, jax.random.PRNGKey(1), progress)
        assert np.isfinite(float(metrics['loss'])), progress


def test_grad_accumulation_matches_full_batch():
    """optax.MultiSteps wiring: k identical micro-batches produce exactly
    the update of one applied step with that gradient, and params are
    frozen on the intermediate micro-steps (TPU-native addition —
    model.optimizer.grad_accumulation_steps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)

    def build(accum):
        cfg = get_cfg_defaults()
        cfg.model.name = 'SemiSupCompletionModel'
        cfg.model.depth_net.name = 'ResNetSAN01'
        cfg.model.depth_net.version = '18A'
        cfg.model.pose_net.name = ''
        cfg.model.params.min_depth = 0.5
        cfg.model.params.max_depth = 15.0
        cfg.model.loss.supervised_method = 'sparse-l1'
        cfg.model.loss.supervised_loss_weight = 1.0
        cfg.model.optimizer.grad_accumulation_steps = accum
        model = setup_model(cfg)
        tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 10)
        return model, tx

    rng = np.random.RandomState(0)
    batch = {
        'rgb': jnp.asarray(rng.rand(2, 64, 96, 3), jnp.float32),
        'depth': jnp.asarray((rng.rand(2, 64, 96, 1) * 10 + 1) *
                             (rng.rand(2, 64, 96, 1) < 0.3), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    model, tx1 = build(1)
    state1 = init_state(model, tx1, batch, jax.random.PRNGKey(7))
    step1 = make_train_step(model, tx1, donate=False)
    state1, _ = step1(state1, batch, key, 0.0)

    model2, tx2 = build(2)
    state2 = init_state(model2, tx2, batch, jax.random.PRNGKey(7))
    step2 = make_train_step(model2, tx2, donate=False)
    mid, _ = step2(state2, batch, key, 0.0)
    # first micro-step: gradients banked, params unchanged
    assert np.allclose(
        np.asarray(jax.tree_util.tree_leaves(mid.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]))
    fin, _ = step2(mid, batch, key, 0.0)
    # after k identical micro-batches the applied update equals the
    # single-step update with that gradient
    for a, b in zip(jax.tree_util.tree_leaves(fin.params),
                    jax.tree_util.tree_leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_ema_params_track_and_eval():
    """Parameter EMA: ema_params converge toward params at the configured
    decay, eval uses them when ema_eval is on, and checkpoints round-trip
    the average (TPU-native addition — model.optimizer.ema_decay)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)
    from packnet_sfm_tpu.utils.checkpoint import (
        save_checkpoint, load_checkpoint)

    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupCompletionModel'
    cfg.model.depth_net.name = 'ResNetSAN01'
    cfg.model.depth_net.version = '18A'
    cfg.model.pose_net.name = ''
    cfg.model.params.min_depth = 0.5
    cfg.model.params.max_depth = 15.0
    cfg.model.loss.supervised_method = 'sparse-l1'
    cfg.model.loss.supervised_loss_weight = 1.0
    cfg.model.optimizer.ema_decay = 0.9
    model = setup_model(cfg)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 10)

    rng = np.random.RandomState(0)
    batch = {
        'rgb': jnp.asarray(rng.rand(2, 64, 96, 3), jnp.float32),
        'depth': jnp.asarray((rng.rand(2, 64, 96, 1) * 10 + 1) *
                             (rng.rand(2, 64, 96, 1) < 0.3), jnp.float32),
    }
    state = init_state(model, tx, batch, jax.random.PRNGKey(0), ema=True)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    step = make_train_step(model, tx, donate=False, ema_decay=0.9)
    s1, _ = step(state, batch, jax.random.PRNGKey(1), 0.0)
    # exact first-step EMA: 0.9 * p0 + 0.1 * p1
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    e1 = jax.tree_util.tree_leaves(s1.ema_params)[0]
    np.testing.assert_allclose(np.asarray(e1),
                               0.9 * np.asarray(p0) + 0.1 * np.asarray(p1),
                               rtol=1e-6, atol=1e-7)

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'ema.ckpt')
        save_checkpoint(path, cfg, s1)
        payload = load_checkpoint(path)
        assert 'ema_params' in payload
        re = jax.tree_util.tree_leaves(payload['ema_params'])[0]
        np.testing.assert_allclose(np.asarray(re), np.asarray(e1),
                                   rtol=1e-6)


def test_lr_warmup_schedule():
    """Linear warmup ramps the schedule over warmup_epochs*steps_per_epoch
    steps, then hands over to the base schedule exactly."""
    import numpy as np
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.parallel.train_step import make_lr_schedule

    cfg = get_cfg_defaults().model.scheduler
    cfg.name = 'StepLR'
    cfg.step_size = 1
    cfg.gamma = 0.5
    cfg.warmup_epochs = 0.5          # 5 steps at 10 steps/epoch
    sched = make_lr_schedule(cfg, 1e-3, steps_per_epoch=10)
    lrs = [float(sched(i)) for i in range(12)]
    np.testing.assert_allclose(lrs[0], 1e-3 / 5)          # ramp start
    np.testing.assert_allclose(lrs[3], 1e-3 * 4 / 5)
    np.testing.assert_allclose(lrs[4], 1e-3)              # ramp end
    np.testing.assert_allclose(lrs[9], 1e-3)              # epoch 0 tail
    np.testing.assert_allclose(lrs[10], 5e-4)             # StepLR decay

    cfg.warmup_epochs = 0.0
    sched0 = make_lr_schedule(cfg, 1e-3, steps_per_epoch=10)
    assert float(sched0(0)) == 1e-3                       # no warmup default


def test_remat_grads_exact():
    """tpu.remat: jax.checkpoint-wrapped forward produces EXACTLY the same
    loss and gradients (it only changes what the backward stores)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)

    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupCompletionModel'
    cfg.model.depth_net.name = 'ResNetSAN01'
    cfg.model.depth_net.version = '18A'
    cfg.model.pose_net.name = ''
    cfg.model.params.min_depth = 0.5
    cfg.model.params.max_depth = 15.0
    cfg.model.loss.supervised_method = 'sparse-l1'
    cfg.model.loss.supervised_loss_weight = 1.0
    model = setup_model(cfg)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 10)

    rng = np.random.RandomState(3)
    batch = {
        'rgb': jnp.asarray(rng.rand(2, 64, 96, 3), jnp.float32),
        'depth': jnp.asarray((rng.rand(2, 64, 96, 1) * 10 + 1) *
                             (rng.rand(2, 64, 96, 1) < 0.3), jnp.float32),
    }
    state = init_state(model, tx, batch, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    s_plain, m_plain = make_train_step(model, tx, donate=False)(
        state, batch, key, 0.0)
    s_remat, m_remat = make_train_step(model, tx, donate=False, remat=True)(
        state, batch, key, 0.0)
    np.testing.assert_allclose(float(m_plain['loss']),
                               float(m_remat['loss']), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                    jax.tree_util.tree_leaves(s_remat.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_dropout_model_trains_one_step():
    """dropout > 0 exercises the 'dropout' rng stream through init and the
    jitted train step (regression: the step previously passed only a 'flip'
    rng, so any dropout config crashed with InvalidRngError)."""
    cfg = small_cfg()
    cfg.model.name = 'SemiSupModel'
    cfg.model.depth_net.name = 'PackNetSlim01'
    cfg.model.depth_net.version = '1A'
    cfg.model.depth_net.dropout = 0.5
    model = setup_model(cfg)
    ds = SyntheticDataset(num_samples=2, height=32, width=64)
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    batch = to_jnp(next(iter(loader)))
    batch.pop('idx')

    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                               steps_per_epoch=10)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), 0.0)
    assert np.isfinite(float(metrics['loss']))


def test_trainer_autocalibrates_row_window():
    """san_row_window == -1 ('auto') must be replaced by a concrete
    data-calibrated fraction before the model is built."""
    from packnet_sfm_tpu.config import parse_train_config
    from packnet_sfm_tpu.trainers.trainer import Trainer
    cfg = parse_train_config('configs/overfit_synthetic.yaml')
    cfg.datasets.train.input_depth_type = ['sparse']
    cfg.model.depth_net.use_film = True
    cfg.model.depth_net.san_row_window = -1
    trainer = Trainer(cfg)
    frac = cfg.model.depth_net.san_row_window
    assert frac != -1 and 0.0 <= frac < 1.0
    # the built model must carry the calibrated value
    assert trainer.model.depth_net.san_row_window == frac
