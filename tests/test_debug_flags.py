"""Env-gated debug instrumentation (reference's secondary flag layer,
SURVEY.md §5: DISP_STATS_*, FORCE_DEPTH_DIV256, GT_DEPTH_DEBUG,
SSI_SILOG_LOG, ONE_STEP_VIZ_DIR)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.utils import debug


@pytest.mark.quick
def test_disp_stats_once(monkeypatch, capsys):
    monkeypatch.setenv('DISP_STATS_ONCE', '1')
    debug._done_flags.discard('DISP_STATS')
    debug.maybe_log_disp_stats(np.random.rand(2, 8, 8, 1))
    assert '[DISP_STATS]' in capsys.readouterr().out
    debug.maybe_log_disp_stats(np.random.rand(2, 8, 8, 1))
    assert capsys.readouterr().out == ''  # ONCE really means once


@pytest.mark.quick
def test_force_depth_div256(monkeypatch):
    gt = jnp.ones((1, 4, 4, 1)) * 2560.0
    monkeypatch.setenv('FORCE_DEPTH_DIV256', '1')
    np.testing.assert_allclose(
        np.asarray(debug.maybe_force_depth_div256(gt)), 10.0)
    monkeypatch.setenv('FORCE_DEPTH_DIV256', '0')
    np.testing.assert_allclose(
        np.asarray(debug.maybe_force_depth_div256(gt)), 2560.0)


@pytest.mark.quick
def test_ssi_silog_log(monkeypatch, capsys):
    from packnet_sfm_tpu.losses.supervised import ssi_silog_loss
    monkeypatch.setenv('SSI_SILOG_LOG', '1')
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32) * 0.5 + 0.1)
    gt = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32) * 0.5 + 0.1)
    mask = jnp.ones_like(gt)
    loss = jax.jit(ssi_silog_loss)(pred, gt, mask)
    jax.block_until_ready(loss)
    jax.effects_barrier()
    out = capsys.readouterr().out
    assert '[SSI_SILOG_LOG]' in out and 'valid_px=256' in out


@pytest.mark.quick
def test_gt_depth_debug_dump(monkeypatch, tmp_path, capsys):
    """GT_DEPTH_DEBUG full forensics (reference:
    SemiSupCompletionModel.py:296-431): stats JSON + histogram +
    smallest samples + depth2inv sanity."""
    import json
    monkeypatch.setenv('GT_DEPTH_DEBUG_ONCE', '1')
    monkeypatch.setenv('GT_DEPTH_DEBUG_DIR', str(tmp_path / 'gtdbg'))
    monkeypatch.setenv('GT_DEPTH_HIST_BINS', '16')
    debug._done_flags.discard('GT_DEPTH_DEBUG')
    d = np.zeros((1, 8, 10, 1), np.float32)
    d[0, 2, 3, 0] = 0.005   # near-zero -> inv > 10 and frac_depth<0.01
    d[0, 4, 5, 0] = 5.0
    d[0, 6, 7, 0] = 50.0
    debug.maybe_dump_gt_depth_debug(d)
    out = capsys.readouterr().out
    assert '[GT_DEPTH_DEBUG] depth stats:' in out
    assert 'smallest_samples' in out
    stats = json.load(open(tmp_path / 'gtdbg' / 'step0_gt_depth_stats.json'))
    assert stats['numel_valid'] == 3
    assert stats['numel_zero_or_neg'] == 80 - 3
    assert stats['frac_depth<0.01'] == pytest.approx(1 / 80)
    assert stats['smallest_samples'][0] == {
        'y': 2, 'x': 3, 'depth': pytest.approx(0.005)}
    assert stats['inv_frac>10'] == pytest.approx(1 / 3)
    assert stats['inv_frac_inf_or_nan'] == 0.0
    assert (tmp_path / 'gtdbg' / 'step0_gt_depth_hist.json').exists()
    # ONCE really means once
    debug.maybe_dump_gt_depth_debug(d)
    assert '[GT_DEPTH_DEBUG]' not in capsys.readouterr().out


@pytest.mark.quick
def test_loss_inv_viz_dump(monkeypatch, tmp_path, capsys):
    """LOSS_INV_VIZ: pred/gt inverse-depth distribution dump with the
    nearest-resize of GT to the pred resolution (reference:
    SemiSupCompletionModel.py:191-294)."""
    import json
    monkeypatch.setenv('LOSS_INV_VIZ_ONCE', '1')
    monkeypatch.setenv('LOSS_INV_VIZ_DIR', str(tmp_path / 'linv'))
    debug._done_flags.discard('LOSS_INV_VIZ')
    rng = np.random.RandomState(0)
    pred_inv = rng.rand(2, 8, 12, 1).astype(np.float32)
    gt = np.zeros((2, 16, 24, 1), np.float32)   # 2x res -> resize path
    # ::4 source lattice -> after floor(i*2) nearest mapping, exactly the
    # even destination pixels sample it: frac 0.25, inv = 2.0 > 1 overflow
    gt[0, ::4, ::4, 0] = 0.5
    debug.maybe_dump_loss_inv_debug(pred_inv, gt)
    out = capsys.readouterr().out
    assert '[LOSS_INV_VIZ] pred_inv:' in out and 'overflow' in out
    stats = json.load(open(tmp_path / 'linv' / 'step0_stats.json'))
    assert stats['frac_gt_inv>1.0'] == pytest.approx(0.25)
    assert stats['pred_inv']['numel'] == 8 * 12
    for name in ('pred_inv', 'gt_inv', 'abs_diff'):
        assert (tmp_path / 'linv' /
                'step0_{}_hist.json'.format(name)).exists()


@pytest.mark.quick
def test_debug_train_batch_dispatcher(monkeypatch, tmp_path, capsys):
    """The per-step dispatcher runs the forward only for LOSS_INV_VIZ and
    converts sigmoid -> bounded inverse depth with the model params."""
    from packnet_sfm_tpu.config.cfg_node import CfgNode
    monkeypatch.setenv('LOSS_INV_VIZ_ONCE', '1')
    monkeypatch.setenv('LOSS_INV_VIZ_DIR', str(tmp_path / 'dlinv'))
    debug._done_flags.discard('LOSS_INV_VIZ')
    rng = np.random.RandomState(1)
    batch = {'rgb': jnp.asarray(rng.rand(1, 8, 12, 3), jnp.float32),
             'depth': jnp.asarray(
                 (rng.rand(1, 8, 12, 1) * 10), jnp.float32)}
    calls = []

    def fake_eval_step(state, b):
        calls.append(1)
        return {'inv_depths': [jnp.asarray(
            rng.rand(1, 8, 12, 1), jnp.float32)]}

    params = CfgNode({'min_depth': 0.5, 'max_depth': 15.0,
                      'use_log_space': False})
    debug.maybe_debug_train_batch(fake_eval_step, None, batch, params)
    assert calls == [1]
    assert '[LOSS_INV_VIZ]' in capsys.readouterr().out
    # off -> no forward
    debug.maybe_debug_train_batch(fake_eval_step, None, batch, params)
    assert calls == [1]


@pytest.mark.quick
def test_one_step_viz(monkeypatch, tmp_path):
    monkeypatch.setenv('ONE_STEP_VIZ_DIR', str(tmp_path / 'viz'))
    debug._done_flags.discard('ONE_STEP_VIZ')
    rng = np.random.RandomState(0)
    batch = {
        'rgb': jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32)),
        'depth': jnp.asarray(
            (rng.rand(2, 16, 24, 1) * 10).astype(np.float32)),
    }

    def fake_eval_step(state, b):
        return {'inv_depths': [jnp.asarray(
            rng.rand(2, 16, 24, 1).astype(np.float32))]}

    debug.maybe_one_step_viz(fake_eval_step, None, batch)
    files = sorted(os.listdir(tmp_path / 'viz'))
    assert 'sample0_rgb.png' in files
    assert 'sample0_pred_inv_depth.png' in files
    assert 'sample1_depth.png' in files
    # fires once
    debug.maybe_one_step_viz(fake_eval_step, None, batch)
    assert sorted(os.listdir(tmp_path / 'viz')) == files
