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
