"""INT8 quantization simulation: dual-head must beat single-head by ~an
order of magnitude (the ST2 design rationale, docs/QUANTIZATION.md)."""

import numpy as np

from packnet_sfm_tpu.ops.quantization import (
    fake_quant_u8, quantization_error_report)


def test_fake_quant_levels():
    import jax.numpy as jnp
    x = jnp.asarray([0.0, 0.5, 1.0, 0.123])
    q = np.asarray(fake_quant_u8(x))
    assert set(np.round(q * 255).astype(int)) <= set(range(256))
    np.testing.assert_allclose(q[0], 0.0)
    np.testing.assert_allclose(q[2], 1.0)


def test_dual_head_beats_single_head():
    rep = quantization_error_report(min_depth=0.5, max_depth=15.0)
    # dual-head fractional step = 1/255 m -> max error ~1.96mm
    assert rep['dual_head']['max_mm'] < 3.0
    # single-head linear blows up at far range (reference: ~28mm+ steps)
    assert rep['single_linear']['max_mm'] > 20.0
    assert rep['dual_head']['max_mm'] < rep['single_linear']['max_mm'] / 5
    # log-space single head sits in between
    assert rep['single_log']['max_mm'] < rep['single_linear']['max_mm']


def test_int8_outputs_measured_eval():
    """The measured INT8 eval mode (eval.py --int8 / params.int8_outputs):
    the jitted metrics step with fake-quantized outputs produces finite
    metrics whose rmse delta vs fp32 is nonzero but bounded by the analytic
    worst-case step (quantization changes depths by < max step size)."""
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, init_state, make_eval_metrics_step)

    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupCompletionModel'
    cfg.model.depth_net.name = 'ResNetSAN01'
    cfg.model.depth_net.version = '18A'
    cfg.model.pose_net.name = ''
    cfg.model.params.min_depth = 0.5
    cfg.model.params.max_depth = 15.0
    cfg.model.params.crop = ''
    cfg.model.loss.supervised_method = 'sparse-l1'
    cfg.model.loss.supervised_loss_weight = 1.0
    model = setup_model(cfg)

    rng = np.random.RandomState(0)
    batch = {
        'rgb': jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32)),
        'depth': jnp.asarray(
            ((rng.rand(2, 32, 64, 1) * 10 + 1) *
             (rng.rand(2, 32, 64, 1) < 0.4)).astype(np.float32)),
    }
    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 10)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))

    fp32 = make_eval_metrics_step(model, cfg.model.params)(state, batch)
    int8 = make_eval_metrics_step(model, cfg.model.params,
                                  int8_outputs=True)(state, batch)
    m32 = np.asarray(fp32['depth'])
    m8 = np.asarray(int8['depth'])
    assert np.isfinite(m8).all()
    delta_rmse = abs(float(m8[2] - m32[2]))  # [abs_rel, sqr_rel, rmse, ...]
    assert delta_rmse > 0.0  # quantization really happened
    assert delta_rmse < 0.1  # bounded by the 8-bit step, not a blow-up
