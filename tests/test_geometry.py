"""Geometry parity tests against torch reference math."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from packnet_sfm_tpu.geometry import (  # noqa: E402

    Pose, Camera, FisheyeCamera, view_synthesis, euler2mat, invert_pose)

pytestmark = pytest.mark.quick


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def torch_euler2mat(angle):
    """Reference euler2mat (geometry/pose_utils.py:8-37)."""
    B = angle.size(0)
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    cosz, sinz = torch.cos(z), torch.sin(z)
    zeros = z * 0
    ones = zeros + 1
    zmat = torch.stack([cosz, -sinz, zeros, sinz, cosz, zeros,
                        zeros, zeros, ones], dim=1).view(B, 3, 3)
    cosy, siny = torch.cos(y), torch.sin(y)
    ymat = torch.stack([cosy, zeros, siny, zeros, ones, zeros,
                        -siny, zeros, cosy], dim=1).view(B, 3, 3)
    cosx, sinx = torch.cos(x), torch.sin(x)
    xmat = torch.stack([ones, zeros, zeros, zeros, cosx, -sinx,
                        zeros, sinx, cosx], dim=1).view(B, 3, 3)
    return xmat.bmm(ymat).bmm(zmat)


def test_euler2mat_matches(rng):
    ang = rng.randn(4, 3).astype(np.float32) * 0.3
    ref = torch_euler2mat(torch.from_numpy(ang)).numpy()
    got = np.asarray(euler2mat(jnp.asarray(ang)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_pose_from_vec_and_inverse(rng):
    vec = rng.randn(3, 6).astype(np.float32) * 0.1
    pose = Pose.from_vec(jnp.asarray(vec))
    inv = pose.inverse()
    prod = np.asarray((pose @ inv).mat)
    np.testing.assert_allclose(prod, np.tile(np.eye(4, dtype=np.float32), (3, 1, 1)),
                               atol=1e-5)
    # invert twice = identity transform of original
    np.testing.assert_allclose(np.asarray(invert_pose(invert_pose(pose.mat))),
                               np.asarray(pose.mat), atol=1e-5)


def test_pose_transform_points(rng):
    vec = rng.randn(2, 6).astype(np.float32) * 0.2
    pts = rng.randn(2, 5, 6, 3).astype(np.float32)
    pose = Pose.from_vec(jnp.asarray(vec))
    got = np.asarray(pose @ jnp.asarray(pts))
    M = np.asarray(pose.mat)
    ref = np.einsum('bij,bhwj->bhwi', M[:, :3, :3], pts) + M[:, None, None, :3, 3]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def make_camera(B=2, H=12, W=16):
    K = np.array([[W * 1.2, 0, W / 2 - 0.5],
                  [0, H * 1.3, H / 2 - 0.5],
                  [0, 0, 1]], np.float32)
    return Camera.create(jnp.asarray(np.tile(K[None], (B, 1, 1))))


def test_pinhole_reconstruct_project_roundtrip(rng):
    B, H, W = 2, 12, 16
    cam = make_camera(B, H, W)
    depth = jnp.asarray(1.0 + rng.rand(B, H, W, 1).astype(np.float32) * 5)
    pts = cam.reconstruct(depth, frame='w')
    coords = cam.project(pts, frame='w')
    # Projecting own reconstruction recovers the identity grid in [-1,1]
    xs = np.linspace(-1, 1, W, dtype=np.float32)
    ys = np.linspace(-1, 1, H, dtype=np.float32)
    ref = np.stack(np.meshgrid(xs, ys), axis=-1)[None].repeat(B, 0)
    np.testing.assert_allclose(np.asarray(coords), ref, atol=1e-4)


def test_pinhole_project_with_pose_shifts(rng):
    """A pure x-translation of the camera shifts projections left/right."""
    B, H, W = 1, 16, 20
    cam = make_camera(B, H, W)
    depth = jnp.ones((B, H, W, 1), jnp.float32) * 4.0
    pts = cam.reconstruct(depth, frame='w')
    vec = np.zeros((B, 6), np.float32)
    vec[:, 0] = 0.5  # translate +x
    ref_cam = Camera(K=cam.K, Tcw=Pose.from_vec(jnp.asarray(vec)))
    coords = np.asarray(ref_cam.project(pts, frame='w'))
    base = np.asarray(cam.project(pts, frame='w'))
    assert (coords[..., 0] > base[..., 0]).all()
    np.testing.assert_allclose(coords[..., 1], base[..., 1], atol=1e-5)


def test_view_synthesis_identity(rng):
    """Identity pose + same camera warps the image onto itself."""
    B, H, W = 1, 16, 20
    cam = make_camera(B, H, W)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray(2.0 + rng.rand(B, H, W, 1).astype(np.float32))
    warped = view_synthesis(img, depth, cam, cam)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(img), atol=1e-4)


def test_view_synthesis_multi_matches_per_scale(rng):
    """The row-concatenated fused warp equals n independent warps — value
    AND depth gradients (the photometric hot path uses it under
    upsample_depth_maps)."""
    import jax
    from packnet_sfm_tpu.geometry.camera_utils import view_synthesis_multi
    B, H, W = 2, 16, 20
    cam = make_camera(B, H, W)
    vec = (rng.randn(B, 6) * 0.05).astype(np.float32)
    ref_cam = Camera(K=cam.K, Tcw=Pose.from_vec(jnp.asarray(vec)))
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depths = [jnp.asarray(2.0 + rng.rand(B, H, W, 1).astype(np.float32))
              for _ in range(4)]

    def fused(ds):
        ws = view_synthesis_multi(img, ds, ref_cam, cam)
        return sum(jnp.sum(w ** 2) for w in ws), ws

    def single(ds):
        ws = [view_synthesis(img, d, ref_cam, cam) for d in ds]
        return sum(jnp.sum(w ** 2) for w in ws), ws

    (lf, wf), gf = jax.value_and_grad(fused, has_aux=True)(depths)
    (ls, wsg), gs = jax.value_and_grad(single, has_aux=True)(depths)
    for a, b in zip(wf, wsg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-6)
    for a, b in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


VADAS_CALIB = {
    'k': np.array([-0.0004, 1.0136, -0.0623, 0.2852, -0.3210, 0.1638, -0.0299],
                  np.float32),
    's': 1.0447, 'div': 1.0447, 'ux': 472.0, 'uy': 280.0,
}


def _np_fisheye_project(X, k, s, div, ux, uy, H, W):
    """Reference VADAS projection re-typed in numpy (camera.py:314-394)."""
    eps = np.finfo(np.float32).eps
    Z = np.clip(X[..., 2], eps, None)
    x_norm = X[..., 0] / Z
    y_norm = X[..., 1] / Z
    r = np.sqrt(x_norm ** 2 + y_norm ** 2)
    theta = np.arctan(r)
    theta_poly = np.full_like(theta, k[0])
    for i in range(1, 7):
        theta_poly = theta_poly + k[i] * theta ** i
    r_safe = np.maximum(r, eps)
    x_dist = (theta_poly / r_safe) * x_norm
    y_dist = (theta_poly / r_safe) * y_norm
    u = s * x_dist + ux
    v = div * y_dist + uy
    return np.stack([2 * u / (W - 1) - 1, 2 * v / (H - 1) - 1], axis=-1)


def _np_fisheye_reconstruct(depth, k, s, div, ux, uy):
    """Reference VADAS reconstruction re-typed in numpy (camera.py:242-312)."""
    eps = np.finfo(np.float32).eps
    B, H, W, _ = depth.shape
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    x_dist = (u - ux) / s
    y_dist = (v - uy) / div
    r_d = np.sqrt(x_dist ** 2 + y_dist ** 2)
    r = np.tan(r_d)
    r_d_safe = np.maximum(r_d, eps)
    x_norm = (r / r_d_safe) * x_dist
    y_norm = (r / r_d_safe) * y_dist
    d = depth[..., 0]
    return np.stack([x_norm[None] * d, y_norm[None] * d, d], axis=-1)


def test_fisheye_matches_reference_math():
    """Project/reconstruct match the reference formulas bit-for-bit-ish."""
    B, H, W = 1, 24, 32
    rng = np.random.RandomState(11)
    k = VADAS_CALIB['k']
    s = div = 220.0  # realistic scale so projections land in-frame
    ux, uy = W / 2.0, H / 2.0
    calib = {'k': np.tile(k[None], (B, 1)), 's': s, 'div': div, 'ux': ux, 'uy': uy}
    cam = FisheyeCamera.create(calib, image_size=(H, W))

    X = rng.randn(B, H, W, 3).astype(np.float32) * np.array([0.3, 0.3, 0.0]) \
        + np.array([0, 0, 4.0], np.float32)
    got = np.asarray(cam.project(jnp.asarray(X), frame='c'))
    ref = _np_fisheye_project(X, k, s, div, ux, uy, H, W)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    depth = (2.0 + rng.rand(B, H, W, 1)).astype(np.float32)
    got_r = np.asarray(cam.reconstruct(jnp.asarray(depth), frame='c'))
    ref_r = _np_fisheye_reconstruct(depth, k, s, div, ux, uy)
    np.testing.assert_allclose(got_r, ref_r, rtol=1e-4, atol=1e-4)


def test_fisheye_polynomial_matches_reference_loop():
    """Horner evaluation equals the reference's power-series loop."""
    B, N = 2, 50
    rng = np.random.RandomState(3)
    k = rng.randn(B, 7).astype(np.float32) * 0.1
    theta = rng.rand(B, 4, N).astype(np.float32)
    # reference loop (camera.py:345-349)
    ref = np.broadcast_to(k[:, 0][:, None, None], theta.shape).copy()
    for i in range(1, 7):
        ref = ref + k[:, i][:, None, None] * theta ** i
    # horner
    got = np.broadcast_to(k[:, 6][:, None, None], theta.shape).copy()
    for i in range(5, -1, -1):
        got = got * theta + k[:, i][:, None, None]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
