"""
Multi-view photometric loss (self-supervised) — pure function, NHWC.

Semantics matched to the reference fork
(reference: packnet_sfm/losses/multiview_photometric_loss.py:58-411):
- inputs are raw sigmoids, converted to depth with the linear bounded mapping
  inside the loss (:362-369); smoothness runs on the sigmoids (:402-404)
- per-scale camera construction with principal-point rescale (:159-187)
- photometric = alpha*SSIM/2-clamped + (1-alpha)*L1, channel-meaned (:218-247)
- optional mean+lambda*sigma clipping (:249-253), optional pixel mask (:256-264)
- reduce 'mean'|'min' over contexts; 'min' implements monodepth2 automasking
  by appending the unwarped-context loss before the min (:269-297, :393-399)
- edge-aware smoothness on mean-normalized maps, weight / 2^i per scale
  (:301-327 with utils/depth.py:165-198)
- ProgressiveScaling decays the number of scales with training progress
  (losses/loss_base.py:10-49)

Supports both pinhole (KITTI, upstream behaviour) and VADAS fisheye (NCDB,
fork behaviour) cameras. TPU note: the whole loss is fusable by XLA; the
gather-heavy warp is the Pallas-kernel candidate (ops/pallas).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from packnet_sfm_tpu.geometry.camera import Camera, FisheyeCamera, scale_intrinsics
from packnet_sfm_tpu.geometry.camera_utils import (
    view_synthesis, view_synthesis_multi)
from packnet_sfm_tpu.ops.image import match_scales, interpolate
from packnet_sfm_tpu.ops.ssim import ssim_loss
from packnet_sfm_tpu.ops.depth import (
    sigmoid_to_depth_linear, calc_smoothness, inv2depth)


class ProgressiveScaling:
    """Decay the number of scales with training progress
    (reference: losses/loss_base.py:10-49)."""

    def __init__(self, progressive_scaling, num_scales=4):
        self.num_scales = num_scales
        if progressive_scaling > 0.0:
            self.breaks = np.float32(
                [progressive_scaling * (i + 1) for i in range(num_scales - 1)]
                + [1.0])
        else:
            self.breaks = None

    def __call__(self, progress):
        if self.breaks is None:
            return self.num_scales
        # num_scales is STRUCTURAL (list lengths under jit) -> progress must
        # be concrete here. The trainer passes static (quantized) progress
        # when progressive_scaling > 0.
        import jax.core
        if isinstance(progress, jax.core.Tracer):
            raise TypeError(
                'progressive_scaling > 0 needs a static progress value '
                '(the number of scales changes the traced structure); '
                'the trainer quantizes progress to the scale boundaries '
                'and re-jits — do not trace progress through this path.')
        return int(self.num_scales - np.searchsorted(self.breaks,
                                                     float(progress)))


@dataclasses.dataclass(frozen=True)
class MultiViewPhotometricLoss:
    num_scales: int = 4
    ssim_loss_weight: float = 0.85
    occ_reg_weight: float = 0.1
    smooth_loss_weight: float = 0.1
    C1: float = 1e-4
    C2: float = 9e-4
    photometric_reduce_op: str = 'min'
    disp_norm: bool = True
    clip_loss: float = 0.0
    progressive_scaling: float = 0.0
    padding_mode: str = 'zeros'
    automask_loss: bool = False
    min_depth: float = 0.05
    max_depth: float = 80.0
    inputs_are_sigmoids: bool = True  # fork behaviour; False = upstream inv-depths
    use_pallas: bool = False  # fused SSIM+L1 kernel (ops/pallas/photometric.py)
    # 'bfloat16' runs the SSIM/L1 maps in half precision: measured 2.74x on
    # the self-sup step (BENCH_NOTES.md). Default fp32 for reference parity.
    photometric_dtype: str = 'float32'

    def __post_init__(self):
        if self.automask_loss:
            assert self.photometric_reduce_op == 'min', \
                'Automasking requires min photometric_reduce_op'

    # ------------------------------------------------------------------ cameras
    def _build_cams(self, shape_full, shape_scaled, K=None, distortion=None,
                    pose=None):
        """Per-scale (cam, ref_cam) pair. ref_cam carries target->ref pose."""
        H, W = shape_full
        DH, DW = shape_scaled
        if distortion is not None:
            cam = FisheyeCamera.create(distortion, image_size=(H, W))
            cam = cam.scaled_to(DH, DW, H, W)
            ref_cam = FisheyeCamera.create(distortion, Tcw=pose,
                                           image_size=(H, W))
            ref_cam = ref_cam.scaled_to(DH, DW, H, W)
            return cam, ref_cam
        sx, sy = DW / float(W), DH / float(H)
        Ks = scale_intrinsics(K, sx, sy)
        return Camera.create(Ks), Camera(K=Ks, Tcw=pose)

    # ------------------------------------------------------------------ terms
    def _photometric(self, t_est, images, masks):
        """Per-pixel photometric maps [B,h,w,1] per scale."""
        out = []
        lowp = self.photometric_dtype == 'bfloat16'
        if lowp:
            t_est = [t.astype(jnp.bfloat16) for t in t_est]
            images = [t.astype(jnp.bfloat16) for t in images]
        for est, img, m in zip(t_est, images, masks):
            # the fused kernel is fp32-internal: under bf16 photometric it
            # adds casts and measures a net loss (BENCH_NOTES round-2
            # ablation: 1281 vs 2463 img/s) -> only engage on the fp32 path
            if self.use_pallas and not lowp and self.ssim_loss_weight > 0.0:
                from packnet_sfm_tpu.ops.pallas.photometric import \
                    photometric_map_pallas
                photo = photometric_map_pallas(
                    est, img, self.ssim_loss_weight, self.C1, self.C2)
            elif self.ssim_loss_weight > 0.0:
                l1 = jnp.abs(est - img)
                # clamp_variance only on the bf16 path (see ops/ssim.py)
                s = ssim_loss(est, img, self.C1, self.C2,
                              clamp_variance=lowp)
                photo = (self.ssim_loss_weight * s.mean(axis=3, keepdims=True)
                         + (1 - self.ssim_loss_weight) * l1.mean(axis=3, keepdims=True))
            else:
                photo = jnp.abs(est - img)
            if self.clip_loss > 0.0:
                # the reference detaches the bound (float(mean + c*std),
                # multiview_photometric_loss.py:249-253) — clipped pixels get
                # ZERO gradient, the bound itself carries none; torch .std()
                # is unbiased (ddof=1)
                mean, std = photo.mean(), photo.std(ddof=1)
                bound = jax.lax.stop_gradient(mean + self.clip_loss * std)
                photo = jnp.minimum(photo, bound)
            if m is not None:
                photo = photo * m
            out.append(photo.astype(jnp.float32) if lowp else photo)
        return out

    def _reduce(self, photometric_losses):
        def reduce_fn(losses):
            if self.photometric_reduce_op == 'mean':
                return sum(l.mean() for l in losses) / len(losses)
            if self.photometric_reduce_op == 'min':
                return jnp.min(jnp.concatenate(losses, axis=3),
                               axis=3).mean()
            raise NotImplementedError(self.photometric_reduce_op)
        n = len(photometric_losses)
        return sum(reduce_fn(pl) for pl in photometric_losses) / n

    def _smoothness(self, maps, images, n):
        sx, sy = calc_smoothness(maps, images, n)
        loss = sum((jnp.abs(sx[i]).mean() + jnp.abs(sy[i]).mean()) / 2 ** i
                   for i in range(n)) / n
        return self.smooth_loss_weight * loss

    # ------------------------------------------------------------------ main
    def __call__(self, image, context, inv_depths, poses, K=None,
                 distortion=None, mask=None, progress=0.0):
        """
        image: target [B,H,W,3]; context: list of refs; inv_depths: list of
        per-scale network outputs (sigmoids by default); poses: list of Pose
        (target->context); K [B,3,3] or distortion dict (fisheye).
        Returns {'loss': scalar, 'metrics': {...}}.
        """
        n = ProgressiveScaling(self.progressive_scaling,
                               self.num_scales)(progress)
        sigmoids = inv_depths[:n]
        if self.inputs_are_sigmoids:
            depths = [sigmoid_to_depth_linear(s, self.min_depth, self.max_depth)
                      for s in sigmoids]
        else:
            depths = inv2depth(sigmoids)
        B, H, W, _ = image.shape

        scale_shapes = [(d.shape[1], d.shape[2]) for d in depths]
        images = match_scales(image, scale_shapes, n)
        if mask is not None:
            masks_scaled = match_scales(mask, scale_shapes, n, mode='nearest')
        else:
            masks_scaled = [None] * n

        # bf16 photometric: warp bf16-cast refs — the loss quantizes pixel
        # values to bf16 anyway, and a bf16 source halves the warp's HBM
        # traffic AND lets the Pallas kernel use the single-pass bf16 MXU
        # contraction (tap selection stays bit-exact; ops/pallas/warp.py)
        lowp = self.photometric_dtype == 'bfloat16'
        fuse_scales = all(s == (H, W) for s in scale_shapes) and n > 1
        photometric_losses = [[] for _ in range(n)]
        for ref_image, pose in zip(context, poses):
            if fuse_scales:
                # upsample_depth_maps: every scale samples the SAME full-res
                # ref with a different grid — one fused warp per context
                cam, ref_cam = self._build_cams((H, W), (H, W), K=K,
                                                distortion=distortion,
                                                pose=pose)
                ref_i = (ref_image.astype(jnp.bfloat16) if lowp
                         else ref_image)
                warped = view_synthesis_multi(
                    ref_i, depths, ref_cam, cam,
                    padding_mode=self.padding_mode)
            else:
                warped = []
                for i in range(n):
                    DH, DW = scale_shapes[i]
                    cam, ref_cam = self._build_cams((H, W), (DH, DW), K=K,
                                                    distortion=distortion,
                                                    pose=pose)
                    ref_i = interpolate(ref_image, (DH, DW), 'bilinear', True)
                    if lowp:
                        ref_i = ref_i.astype(jnp.bfloat16)
                    warped.append(view_synthesis(
                        ref_i, depths[i], ref_cam, cam,
                        padding_mode=self.padding_mode))
            photo = self._photometric(warped, images, masks_scaled)
            for i in range(n):
                photometric_losses[i].append(photo[i])
            if self.automask_loss:
                ref_scales = match_scales(ref_image, scale_shapes, n)
                # under upsample_depth_maps=True every scale is full-res, so
                # the n unwarped maps are IDENTICAL — compute each distinct
                # (ref, target) pair once instead of relying on XLA CSE
                uniq = {}
                for i in range(n):
                    key = (id(ref_scales[i]), id(images[i]),
                           id(masks_scaled[i]))
                    if key not in uniq:
                        uniq[key] = self._photometric(
                            [ref_scales[i]], [images[i]],
                            [masks_scaled[i]])[0]
                    photometric_losses[i].append(uniq[key])

        loss = self._reduce(photometric_losses)
        metrics = {'photometric_loss': loss}
        if self.smooth_loss_weight > 0.0:
            # fork smooths the raw sigmoids (:402-404); upstream smooths inv-depths
            smooth = self._smoothness(sigmoids, images, n)
            metrics['smoothness_loss'] = smooth
            loss = loss + smooth
        return {'loss': loss, 'metrics': metrics}
