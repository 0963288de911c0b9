"""
End-to-end golden test: the full photometric loss (camera -> warp -> SSIM+L1
-> automask min -> smoothness) against an independent PyTorch composition of
the same math (pinhole path). This is the layer where parity is won or lost
(SURVEY.md §7 step 2).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from packnet_sfm_tpu.geometry import Pose  # noqa: E402
from packnet_sfm_tpu.losses import MultiViewPhotometricLoss  # noqa: E402

B, H, W = 2, 32, 48
MIN_D, MAX_D = 0.5, 15.0


def torch_photometric_loss(image, contexts, sigmoids, poses_mat, K,
                           alpha=0.85, automask=True, smooth_w=0.001):
    """Independent torch re-composition of the reference math."""
    def to_t(x):
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    def ssim_map(x, y, C1=1e-4, C2=9e-4):
        pool = torch.nn.AvgPool2d(3, 1)
        refl = torch.nn.ReflectionPad2d(1)
        x, y = refl(x), refl(y)
        mu_x, mu_y = pool(x), pool(y)
        sx = pool(x * x) - mu_x ** 2
        sy = pool(y * y) - mu_y ** 2
        sxy = pool(x * y) - mu_x * mu_y
        num = (2 * mu_x * mu_y + C1) * (2 * sxy + C2)
        den = (mu_x ** 2 + mu_y ** 2 + C1) * (sx + sy + C2)
        return torch.clamp((1 - num / den) / 2, 0, 1)

    n = len(sigmoids)
    img_t = to_t(image)
    total = 0.0
    for i in range(n):
        sig = to_t(sigmoids[i])
        dh, dw = sig.shape[-2:]
        # sigmoid -> depth (linear bounded)
        inv = 1 / MAX_D + (1 / MIN_D - 1 / MAX_D) * sig
        depth = 1.0 / (inv + 1e-8)
        # scaled intrinsics (pixel-center convention)
        sxf, syf = dw / W, dh / H
        Ks = K.copy()
        Ks[:, 0, 0] *= sxf
        Ks[:, 1, 1] *= syf
        Ks[:, 0, 2] = (Ks[:, 0, 2] + 0.5) * sxf - 0.5
        Ks[:, 1, 2] = (Ks[:, 1, 2] + 0.5) * syf - 0.5
        Kt = torch.from_numpy(Ks)
        Kinv = torch.inverse(Kt)
        # pixel grid -> rays -> world points (Twc = identity for target cam)
        ys, xs = torch.meshgrid(torch.arange(dh, dtype=torch.float64),
                                torch.arange(dw, dtype=torch.float64),
                                indexing='ij')
        grid = torch.stack([xs, ys, torch.ones_like(xs)], 0).reshape(1, 3, -1)
        grid = grid.repeat(B, 1, 1).to(torch.float32)
        rays = Kinv.bmm(grid)
        Xw = rays * depth.reshape(B, 1, -1)

        img_i = F.interpolate(img_t, size=(dh, dw), mode='bilinear',
                              align_corners=True)
        scale_losses = []
        for ctx, pose in zip(contexts, poses_mat):
            Tp = torch.from_numpy(pose)
            Xc = Tp[:, :3, :3].bmm(Xw) + Tp[:, :3, 3:4]
            pix = Kt.bmm(Xc)
            Z = pix[:, 2].clamp(min=1e-5)
            un = 2 * (pix[:, 0] / Z) / (dw - 1) - 1
            vn = 2 * (pix[:, 1] / Z) / (dh - 1) - 1
            coords = torch.stack([un, vn], -1).reshape(B, dh, dw, 2)
            ctx_i = F.interpolate(to_t(ctx), size=(dh, dw), mode='bilinear',
                                  align_corners=True)
            warped = F.grid_sample(ctx_i, coords, mode='bilinear',
                                   padding_mode='zeros', align_corners=True)
            for est in ([warped, ctx_i] if automask else [warped]):
                l1 = (est - img_i).abs().mean(1, True)
                s = ssim_map(est, img_i).mean(1, True)
                scale_losses.append(alpha * s + (1 - alpha) * l1)
        photo = torch.cat(scale_losses, 1).min(1, True)[0].mean()
        total = total + photo
    loss = total / n

    # smoothness on sigmoids (fork semantics)
    smooth = 0.0
    for i in range(n):
        sig = to_t(sigmoids[i])
        dh, dw = sig.shape[-2:]
        img_i = F.interpolate(img_t, size=(dh, dw), mode='bilinear',
                              align_corners=True)
        norm = sig / sig.mean(2, True).mean(3, True).clamp(min=1e-6)
        gx = (norm[:, :, :, :-1] - norm[:, :, :, 1:]).abs()
        gy = (norm[:, :, :-1, :] - norm[:, :, 1:, :]).abs()
        wx = torch.exp(-(img_i[:, :, :, :-1] - img_i[:, :, :, 1:])
                       .abs().mean(1, True))
        wy = torch.exp(-(img_i[:, :, :-1, :] - img_i[:, :, 1:, :])
                       .abs().mean(1, True))
        smooth = smooth + ((gx * wx).mean() + (gy * wy).mean()) / 2 ** i
    loss = loss + smooth_w * smooth / n
    return float(loss)


def test_photometric_matches_torch_composition():
    rng = np.random.RandomState(42)
    image = rng.rand(B, H, W, 3).astype(np.float32)
    contexts = [rng.rand(B, H, W, 3).astype(np.float32) for _ in range(2)]
    sigmoids = [rng.rand(B, H // 2 ** i, W // 2 ** i, 1)
                .astype(np.float32) * 0.6 + 0.2 for i in range(4)]
    K = np.tile(np.array([[W * 1.2, 0, W / 2 - 0.5],
                          [0, W * 1.2, H / 2 - 0.5],
                          [0, 0, 1]], np.float32)[None], (B, 1, 1))
    vecs = (rng.randn(2, B, 6) * 0.05).astype(np.float32)
    poses_mat = [np.asarray(Pose.from_vec(jnp.asarray(v)).mat) for v in vecs]

    ref = torch_photometric_loss(image, contexts, sigmoids, poses_mat, K)

    loss_fn = MultiViewPhotometricLoss(
        photometric_reduce_op='min', automask_loss=True,
        smooth_loss_weight=0.001, clip_loss=0.0,
        min_depth=MIN_D, max_depth=MAX_D)
    poses = [Pose(jnp.asarray(m)) for m in poses_mat]
    got = float(loss_fn(jnp.asarray(image),
                        [jnp.asarray(c) for c in contexts],
                        [jnp.asarray(s) for s in sigmoids],
                        poses, K=jnp.asarray(K))['loss'])
    np.testing.assert_allclose(got, ref, rtol=2e-4)
