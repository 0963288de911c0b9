"""On-device color jitter tests."""

import numpy as np

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.ops.augment import device_color_jitter


def make_batch():
    rng = np.random.RandomState(0)
    return {
        'rgb': jnp.asarray(rng.rand(4, 16, 24, 3).astype(np.float32)),
        'rgb_context': [jnp.asarray(rng.rand(4, 16, 24, 3)
                                    .astype(np.float32))],
    }


def test_jitter_changes_rgb_preserves_original():
    batch = make_batch()
    out = device_color_jitter(batch, jax.random.PRNGKey(0),
                              (0.2, 0.2, 0.2, 0.05))
    assert not np.allclose(np.asarray(out['rgb']), np.asarray(batch['rgb']))
    np.testing.assert_array_equal(np.asarray(out['rgb_original']),
                                  np.asarray(batch['rgb']))
    np.testing.assert_array_equal(np.asarray(out['rgb_context_original'][0]),
                                  np.asarray(batch['rgb_context'][0]))
    v = np.asarray(out['rgb'])
    assert v.min() >= 0 and v.max() <= 1


def test_jitter_per_sample_factors_differ():
    batch = make_batch()
    out = device_color_jitter(batch, jax.random.PRNGKey(1),
                              (0.5, 0.0, 0.0, 0.0))
    ratio = np.asarray(out['rgb']) / np.maximum(np.asarray(batch['rgb']),
                                                1e-6)
    med = [np.median(ratio[i]) for i in range(4)]
    assert np.std(med) > 1e-3  # different brightness per sample


def test_jitter_jittable():
    batch = make_batch()
    f = jax.jit(lambda b, k: device_color_jitter(b, k, (0.2, 0.2, 0.2, 0.05)))
    out = f(batch, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out['rgb'])).all()
