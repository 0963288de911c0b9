"""Loss tests: behavioural invariants + golden values vs reference formulas."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.geometry import Pose
from packnet_sfm_tpu.losses import (
    MultiViewPhotometricLoss, SupervisedLoss, DualHeadDepthLoss, velocity_loss)
from packnet_sfm_tpu.losses.supervised import (

    ssi_loss, silog_loss, berhu_loss, ssi_silog_loss)

pytestmark = pytest.mark.quick

B, H, W = 2, 32, 48


def make_K():
    K = np.array([[W * 1.1, 0, W / 2 - 0.5],
                  [0, H * 1.1, H / 2 - 0.5],
                  [0, 0, 1]], np.float32)
    return jnp.asarray(np.tile(K[None], (B, 1, 1)))


def make_sigmoids(rng, n=4):
    return [jnp.asarray(rng.rand(B, H // 2 ** i, W // 2 ** i, 1)
                        .astype(np.float32) * 0.5 + 0.2) for i in range(n)]


def test_photometric_identity_is_zero():
    """Identity pose + same image as context -> zero photometric loss."""
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    sig = make_sigmoids(rng)
    loss_fn = MultiViewPhotometricLoss(
        photometric_reduce_op='mean', automask_loss=False,
        smooth_loss_weight=0.0, clip_loss=0.0)
    out = loss_fn(image, [image], sig, [Pose.identity(B)], K=make_K())
    assert float(out['loss']) < 1e-5


def test_photometric_translation_increases_loss():
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    sig = make_sigmoids(rng)
    vec = np.zeros((B, 6), np.float32)
    vec[:, 0] = 0.5
    loss_fn = MultiViewPhotometricLoss(
        photometric_reduce_op='mean', automask_loss=False,
        smooth_loss_weight=0.0)
    out = loss_fn(image, [image], sig, [Pose.from_vec(jnp.asarray(vec))],
                  K=make_K())
    assert float(out['loss']) > 1e-3


def test_photometric_automask_min():
    """With automask, a static scene (context == target) reduces to ~0 via min."""
    rng = np.random.RandomState(2)
    image = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    sig = make_sigmoids(rng)
    vec = np.zeros((B, 6), np.float32)
    vec[:, 2] = 1.0
    loss_fn = MultiViewPhotometricLoss(
        photometric_reduce_op='min', automask_loss=True,
        smooth_loss_weight=0.0)
    out = loss_fn(image, [image], sig, [Pose.from_vec(jnp.asarray(vec))],
                  K=make_K())
    assert float(out['loss']) < 1e-5


def test_photometric_fisheye_path_runs_and_differentiates():
    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    sig = make_sigmoids(rng)
    distortion = {
        'k': jnp.asarray(np.tile(np.array(
            [-0.0004, 1.0136, -0.0623, 0.2852, -0.332, 0.1896, -0.0391],
            np.float32)[None], (B, 1))),
        's': jnp.full((B,), 1.0447), 'div': jnp.full((B,), 1.0447),
        'ux': jnp.full((B,), W / 2.0), 'uy': jnp.full((B,), H / 2.0),
    }
    vec = np.zeros((B, 6), np.float32)
    vec[:, 2] = 0.3
    pose = Pose.from_vec(jnp.asarray(vec))
    loss_fn = MultiViewPhotometricLoss(smooth_loss_weight=0.001,
                                       automask_loss=True,
                                       photometric_reduce_op='min')

    def f(s0):
        out = loss_fn(image, [image * 0.9], [s0] + sig[1:], [pose],
                      distortion=distortion)
        return out['loss']

    val, grad = jax.value_and_grad(f)(sig[0])
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0


def test_supervised_sparse_l1_denominator_semantics():
    """sparse-l1 averages filled tensors over ALL pixels (reference quirk)."""
    rng = np.random.RandomState(4)
    pred = [jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))]
    gt = rng.rand(B, H, W, 1).astype(np.float32)
    gt[gt < 0.7] = 0.0  # ~70% invalid
    loss = SupervisedLoss(supervised_method='sparse-l1',
                          supervised_num_scales=1)(
        pred, jnp.asarray(gt))['loss']
    mask = gt > 0
    expected = (np.abs(np.asarray(pred[0]) - gt) * mask).sum() / gt.size
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_ssi_matches_reference_formula():
    rng = np.random.RandomState(5)
    pred = rng.rand(B, H, W, 1).astype(np.float32)
    gt = rng.rand(B, H, W, 1).astype(np.float32)
    mask = (rng.rand(B, H, W, 1) > 0.5).astype(np.float32)
    diff = (pred - gt)[mask > 0]
    mean = diff.mean()
    var = (diff ** 2).mean() - mean ** 2
    expected = var + 0.85 * mean ** 2
    got = ssi_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_silog_matches_reference_formula():
    rng = np.random.RandomState(6)
    pred = rng.rand(B, H, W, 1).astype(np.float32) + 0.5
    gt = rng.rand(B, H, W, 1).astype(np.float32) + 0.5
    mask = np.ones_like(pred)
    ld = np.log(pred) - np.log(gt)
    expected = np.sqrt((ld ** 2).mean() - 0.85 * ld.mean() ** 2 + 1e-8)
    got = silog_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_berhu_matches_reference_formula():
    rng = np.random.RandomState(7)
    pred = rng.rand(B, H, W, 1).astype(np.float32)
    gt = rng.rand(B, H, W, 1).astype(np.float32)
    huber_c = 0.2 * (pred - gt).max()
    diff = np.abs(pred - gt)
    over = diff > huber_c
    expected = np.concatenate([diff.reshape(-1), (diff[over] ** 2)]).mean()
    got = berhu_loss(jnp.asarray(pred), jnp.asarray(gt),
                     jnp.ones_like(jnp.asarray(pred)))
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_ssi_silog_guard_and_finiteness():
    rng = np.random.RandomState(8)
    pred = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) + 0.1)
    gt = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) + 0.1)
    full = jnp.ones_like(pred)
    v = ssi_silog_loss(pred, gt, full, min_depth=0.5, max_depth=15.0)
    assert np.isfinite(float(v)) and float(v) > 0
    # <100 valid pixels -> exactly 0
    tiny = jnp.zeros_like(pred).at[0, :5, :5, :].set(1.0)
    v0 = ssi_silog_loss(pred, gt, tiny, min_depth=0.5, max_depth=15.0)
    assert float(v0) == 0.0


def test_dual_head_loss_manual():
    integer = jnp.full((1, 4, 4, 1), 5.0 / 15.0)
    fractional = jnp.full((1, 4, 4, 1), 0.5)
    outputs = {('integer', 0): integer, ('fractional', 0): fractional}
    gt = jnp.full((1, 4, 4, 1), 5.7)
    out = DualHeadDepthLoss(max_depth=15.0, min_depth=0.5)(outputs, gt)
    np.testing.assert_allclose(float(out['metrics']['integer_loss']), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(out['metrics']['fractional_loss']), 0.2, atol=1e-5)
    np.testing.assert_allclose(float(out['metrics']['consistency_loss']), 0.2, atol=1e-5)
    np.testing.assert_allclose(float(out['loss']), 10 * 0.2 + 0.5 * 0.2, atol=1e-4)


def test_dual_head_loss_log_metrics():
    """The ST2-report metrics (reference dual_head_depth_loss.py:178-195):
    mean/median depth error, integer accuracy (<1 m), fractional RMSE."""
    integer = jnp.full((1, 4, 4, 1), 5.0 / 15.0)
    fractional = jnp.full((1, 4, 4, 1), 0.5)
    outputs = {('integer', 0): integer, ('fractional', 0): fractional}
    gt = np.full((1, 4, 4, 1), 5.7, np.float32)
    gt[0, 0, 0, 0] = 0.0  # invalid pixel must not bias the masked stats
    out = DualHeadDepthLoss(max_depth=15.0, min_depth=0.5)(
        outputs, jnp.asarray(gt))
    m = out['metrics']
    np.testing.assert_allclose(float(m['mean_depth_error']), 0.2, atol=1e-5)
    np.testing.assert_allclose(float(m['median_depth_error']), 0.2, atol=1e-5)
    np.testing.assert_allclose(float(m['integer_accuracy']), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(m['fractional_rmse']), 0.2, atol=1e-5)
    np.testing.assert_allclose(float(m['total_loss']), float(out['loss']),
                               atol=0)


def test_velocity_loss():
    vec = np.zeros((B, 6), np.float32)
    vec[:, 0] = 2.0
    pred = [Pose.from_vec(jnp.asarray(vec))]
    gt = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    gt[:, 0, 3] = 3.0
    out = velocity_loss(pred, [jnp.asarray(gt)])
    np.testing.assert_allclose(float(out['loss']), 1.0, atol=1e-5)


def test_supervised_all_methods_run():
    rng = np.random.RandomState(9)
    pred = [jnp.asarray(rng.rand(B, H // 2 ** i, W // 2 ** i, 1)
                        .astype(np.float32) + 0.1) for i in range(4)]
    gt = rng.rand(B, H, W, 1).astype(np.float32) + 0.1
    gt[rng.rand(B, H, W, 1) < 0.5] = 0.0
    gt = jnp.asarray(gt)
    for method in ['sparse-l1', 'sparse-mse', 'sparse-berhu', 'sparse-silog',
                   'sparse-abs_rel', 'sparse-ssi', 'sparse-enhanced-ssi',
                   'sparse-progressive-ssi', 'sparse-ssi-trim',
                   'sparse-ssi-silog', 'l1', 'mse']:
        kwargs = (('min_depth', 0.5), ('max_depth', 15.0))
        out = SupervisedLoss(supervised_method=method,
                             loss_kwargs=kwargs)(pred, gt)
        assert np.isfinite(float(out['loss'])), method


def test_photometric_bf16_close_to_fp32():
    """bf16 photometric (the 2.74x fast path) stays within ~1% of fp32."""
    import dataclasses
    rng = np.random.RandomState(11)
    image = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    ctx = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    sig = make_sigmoids(rng)
    vec = np.zeros((B, 6), np.float32)
    vec[:, 0] = 0.2
    pose = Pose.from_vec(jnp.asarray(vec))
    base = MultiViewPhotometricLoss(photometric_reduce_op='min',
                                    automask_loss=True,
                                    smooth_loss_weight=0.001)
    lowp = dataclasses.replace(base, photometric_dtype='bfloat16')
    v32 = float(base(image, [ctx], sig, [pose], K=make_K())['loss'])
    v16 = float(lowp(image, [ctx], sig, [pose], K=make_K())['loss'])
    assert abs(v32 - v16) / abs(v32) < 0.02

    # gradients should agree directionally (cosine similarity > 0.99)
    def loss_of(fn):
        def f(s0):
            return fn(image, [ctx], [s0] + sig[1:], [pose],
                      K=make_K())['loss']
        return jax.grad(f)(sig[0])
    g32 = np.asarray(loss_of(base)).ravel()
    g16 = np.asarray(loss_of(lowp)).ravel()
    cos = np.dot(g32, g16) / (np.linalg.norm(g32) * np.linalg.norm(g16))
    assert cos > 0.99


def test_progressive_ssi_jit_safe_with_traced_epoch():
    """sparse-progressive-ssi must work with a TRACED epoch (state.epoch)."""
    rng = np.random.RandomState(12)
    pred = [jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) + 0.1)]
    gt = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) + 0.1)
    loss_obj = SupervisedLoss(supervised_method='sparse-progressive-ssi',
                              supervised_num_scales=1)

    @jax.jit
    def f(epoch):
        return loss_obj(pred, gt, epoch=epoch)['loss']

    v0 = float(f(jnp.asarray(0, jnp.int32)))
    v20 = float(f(jnp.asarray(20, jnp.int32)))
    assert np.isfinite(v0) and np.isfinite(v20)
    assert v0 != v20  # schedule actually changes the mix


def test_clip_loss_bound_is_detached():
    """clip_loss semantics (reference multiview_photometric_loss.py:249-253):
    the clamp bound is DETACHED (float() in torch), so clipped elements get
    zero gradient and the bound routes no cotangent back through mean/std
    into the rest of the map.

    Sharp assertion: with pure L1 (per-channel map, like the reference) the
    loss gradient w.r.t. the TARGET image is elementwise either ZERO (that
    channel's photo value was clipped) or EQUAL to the unclipped gradient.
    A traced (undetached) bound would instead shift EVERY element through
    the mean/std cotangent."""
    rng = np.random.RandomState(3)
    image0 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    context = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    vec = np.zeros((B, 6), np.float32)
    vec[:, 0] = 0.2
    pose = Pose.from_vec(jnp.asarray(vec))
    kw = dict(photometric_reduce_op='mean', automask_loss=False,
              smooth_loss_weight=0.0, num_scales=1, ssim_loss_weight=0.0)
    sig = make_sigmoids(rng, n=1)[0]

    def loss_with(clip, img):
        fn = MultiViewPhotometricLoss(clip_loss=clip, **kw)
        return fn(img, [context], [sig], [pose], K=make_K())['loss']

    gc = np.asarray(jax.grad(lambda im: loss_with(1.0, im))(image0))
    gr = np.asarray(jax.grad(lambda im: loss_with(0.0, im))(image0))
    assert np.all(np.isfinite(gc))
    zeroed = np.abs(gc) <= 1e-12
    kept = ~zeroed
    # the clip must actually bind on this data (some channels zeroed, the
    # value strictly below the unclipped loss)
    assert zeroed.any() and kept.any()
    assert float(loss_with(1.0, image0)) < float(loss_with(0.0, image0))
    # surviving elements are bit-identical to the unclipped gradient —
    # nothing leaked through the (detached) bound
    np.testing.assert_allclose(gc[kept], gr[kept], rtol=1e-5, atol=1e-8)
    # zeroed elements correspond to genuinely nonzero unclipped gradients
    assert np.abs(gr[zeroed]).max() > 1e-4
