"""End-to-end model tests: forward + loss + grads for the model family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.config import get_cfg_defaults
from packnet_sfm_tpu.models import setup_model

B, H, W = 2, 32, 64


def make_batch(rng, with_depth=True, with_input_depth=False, fisheye=False):
    def img():
        return jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

    K = np.array([[W, 0, W / 2 - 0.5], [0, H, H / 2 - 0.5], [0, 0, 1]],
                 np.float32)
    batch = {
        'rgb': img(),
        'rgb_original': img(),
        'rgb_context': [img(), img()],
        'rgb_context_original': [img(), img()],
        'intrinsics': jnp.asarray(np.tile(K[None], (B, 1, 1))),
    }
    if fisheye:
        batch['distortion_coeffs'] = {
            'k': jnp.asarray(np.tile(np.array(
                [-0.0004, 1.0136, -0.0623, 0.2852, -0.332, 0.1896, -0.0391],
                np.float32)[None], (B, 1))),
            's': jnp.full((B,), 1.0447), 'div': jnp.full((B,), 1.0447),
            'ux': jnp.full((B,), W / 2.0), 'uy': jnp.full((B,), H / 2.0),
        }
    if with_depth:
        d = rng.rand(B, H, W, 1).astype(np.float32) * 10
        d[rng.rand(B, H, W, 1) < 0.7] = 0.0
        batch['depth'] = jnp.asarray(d)
    if with_input_depth:
        d = rng.rand(B, H, W, 1).astype(np.float32) * 10
        d[rng.rand(B, H, W, 1) < 0.95] = 0.0
        batch['input_depth'] = jnp.asarray(d)
    return batch


def build_cfg(model='SelfSupModel', depth_net='ResNetSAN01', **loss_overrides):
    cfg = get_cfg_defaults()
    cfg.model.name = model
    cfg.model.depth_net.name = depth_net
    cfg.model.depth_net.version = '18A'
    cfg.model.pose_net.name = 'PoseNet'
    cfg.model.params.min_depth = 0.5
    cfg.model.params.max_depth = 15.0
    cfg.model.loss.supervised_method = 'sparse-l1'
    for k, v in loss_overrides.items():
        cfg.model.loss[k] = v
    return cfg


def init_and_loss(cfg, batch):
    model = setup_model(cfg)
    rngs = {'params': jax.random.PRNGKey(0), 'flip': jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {'params': params, 'batch_stats': variables.get('batch_stats', {})},
            batch, train=True, rngs={'flip': jax.random.PRNGKey(2)},
            mutable=['batch_stats'])
        return out['loss']

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    return model, variables, float(loss), grads


def test_selfsup_model_trains():
    rng = np.random.RandomState(0)
    cfg = build_cfg('SelfSupModel')
    _, _, loss, grads = init_and_loss(cfg, make_batch(rng, with_depth=False))
    assert np.isfinite(loss) and loss > 0
    leaf_norms = [float(jnp.abs(g).sum())
                  for g in jax.tree_util.tree_leaves(grads)]
    assert np.isfinite(leaf_norms).all()
    assert sum(n > 0 for n in leaf_norms) > len(leaf_norms) * 0.5


def test_semisup_model():
    rng = np.random.RandomState(1)
    cfg = build_cfg('SemiSupModel')
    _, _, loss, _ = init_and_loss(cfg, make_batch(rng))
    assert np.isfinite(loss) and loss > 0


def test_semisup_completion_with_lidar():
    rng = np.random.RandomState(2)
    cfg = build_cfg('SemiSupCompletionModel',
                    supervised_method='sparse-ssi-silog')
    cfg.model.depth_net.use_film = True
    _, _, loss, grads = init_and_loss(
        cfg, make_batch(rng, with_input_depth=True))
    assert np.isfinite(loss) and loss > 0


def test_semisup_completion_dual_head():
    rng = np.random.RandomState(3)
    cfg = build_cfg('SemiSupCompletionModel',
                    supervised_loss_weight=1.0)  # reference dual-head configs
    cfg.model.depth_net.use_dual_head = True
    _, _, loss, _ = init_and_loss(cfg, make_batch(rng))
    assert np.isfinite(loss)


def test_completion_fisheye():
    rng = np.random.RandomState(4)
    cfg = build_cfg('SemiSupCompletionModel',
                    supervised_method='sparse-ssi-silog')
    _, _, loss, _ = init_and_loss(cfg, make_batch(rng, fisheye=True))
    assert np.isfinite(loss) and loss > 0


def test_eval_mode_returns_predictions():
    rng = np.random.RandomState(5)
    cfg = build_cfg('SelfSupModel')
    batch = make_batch(rng, with_depth=False)
    model = setup_model(cfg)
    rngs = {'params': jax.random.PRNGKey(0), 'flip': jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=True)
    out = model.apply(variables, batch, train=False)
    assert len(out['inv_depths']) == 1
    assert out['inv_depths'][0].shape == (B, H, W, 1)


def test_resnet50_bottleneck_variant():
    """ResNet-50 (Bottleneck) encoder path with scaled decoder channels."""
    rng = np.random.RandomState(6)
    cfg = build_cfg('SelfSupModel')
    cfg.model.depth_net.version = '50A'
    batch = make_batch(rng, with_depth=False)
    model = setup_model(cfg)
    rngs = {'params': jax.random.PRNGKey(0), 'flip': jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=True)
    out = model.apply(variables, batch, train=False)
    assert out['inv_depths'][0].shape == (B, H, W, 1)


def test_flip_tta_probability_one():
    """flip_lr_prob=1 must keep outputs finite and at the right shapes
    (flip applied to input, flipped back on output)."""
    rng = np.random.RandomState(7)
    cfg = build_cfg('SelfSupModel')
    cfg.model.loss.flip_lr_prob = 1.0
    batch = make_batch(rng, with_depth=False)
    model = setup_model(cfg)
    assert model.flip_lr_prob == 1.0
    rngs = {'params': jax.random.PRNGKey(0), 'flip': jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, train=True)
    out, _ = model.apply(variables, batch, train=True,
                         rngs={'flip': jax.random.PRNGKey(5)},
                         mutable=['batch_stats'])
    assert np.isfinite(float(out['loss']))


def test_velsup_model():
    rng = np.random.RandomState(8)
    cfg = build_cfg('VelSupModel')
    batch = make_batch(rng, with_depth=False)
    T = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    T[:, 0, 3] = 0.5
    batch['pose_context'] = [jnp.asarray(T), jnp.asarray(T)]
    _, _, loss, _ = init_and_loss(cfg, batch)
    assert np.isfinite(loss) and loss > 0
