"""
Generic (ray-surface) multi-view photometric loss
(reference: losses/generic_multiview_photometric_loss.py:92-402):

- the working ray surface is canonical_template + coeff * residual, with
  coeff = min((100*progress)^(4/3)/100, 1) ramping the learned residual in
  (:192-194), normalized to unit rays
- warp via GenericCamera softmax projection with progress-annealed
  temperature
- photometric / clip / reduce / smoothness identical to the standard loss

The canonical ray template: the reference loads 'omnicam_ray_template.npy'
from the working directory (:146-148); here a template array can be passed
in, and when absent a pinhole template is derived from the batch intrinsics
(TPU-native default, no file dependency).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from packnet_sfm_tpu.geometry.camera_generic import (
    GenericCamera, pinhole_ray_surface)
from packnet_sfm_tpu.ops.image import match_scales, interpolate, grid_sample
from packnet_sfm_tpu.ops.depth import inv2depth
from packnet_sfm_tpu.losses.photometric import (
    MultiViewPhotometricLoss, ProgressiveScaling)


@dataclasses.dataclass(frozen=True)
class GenericMultiViewPhotometricLoss(MultiViewPhotometricLoss):
    num_scales: int = 1
    patch_side: int = 20
    inputs_are_sigmoids: bool = False  # generic family works on inv-depths
    # TPU-native addition: project at FULL resolution. The reference pins
    # the softmax ray projection to half-res because its dense [HW, K, 3]
    # patch tensor is 620 MB/image at half-res already
    # (reference: geometry/camera_generic.py:159-208); the Pallas
    # generic-projection kernel (ops/pallas/generic_projection.py) keeps
    # the ray plane in VMEM, making full-res training practical
    # (31 ms fwd+bwd at 192x640 — BENCH_NOTES).
    full_res_projection: bool = False

    def __call__(self, image, context, inv_depths, poses, ray_surface=None,
                 K=None, ray_template=None, mask=None, progress=0.0,
                 **unused):
        n = ProgressiveScaling(self.progressive_scaling,
                               self.num_scales)(progress)
        inv_depths = inv_depths[:n]
        depths = inv2depth(inv_depths)
        B, H, W, _ = image.shape

        residual = ray_surface[('raysurf', 0)] \
            if isinstance(ray_surface, dict) else ray_surface
        if ray_template is None:
            assert K is not None, 'Need intrinsics to derive a ray template'
            template = pinhole_ray_surface(K, H, W, image.dtype)
        else:
            template = ray_template
        # residual ramp coeff (reference :192-194); jit-safe traced progress
        p = jnp.asarray(progress, jnp.float32)
        coeff = jnp.minimum((100.0 * p) ** (4.0 / 3.0) / 100.0, 1.0)
        rmat = template + coeff * residual
        rmat = rmat / jnp.maximum(
            jnp.linalg.norm(rmat, axis=-1, keepdims=True), 1e-8)

        scale_shapes = [(d.shape[1], d.shape[2]) for d in depths]
        images = match_scales(image, scale_shapes, n)

        photometric_losses = [[] for _ in range(n)]
        for ref_image, pose in zip(context, poses):
            cam = GenericCamera.create(rmat, patch_side=self.patch_side)
            ref_cam = GenericCamera.create(rmat, Tcw=pose,
                                           patch_side=self.patch_side)
            warped = []
            for i in range(n):
                DH, DW = scale_shapes[i]
                ref_i = interpolate(ref_image, (DH, DW), 'bilinear', True)
                world = cam.reconstruct(depths[i], frame='w')
                coords = ref_cam.project(
                    world, progress=progress, frame='w',
                    downsample=not self.full_res_projection)
                warped.append(grid_sample(ref_i, coords,
                                          padding_mode=self.padding_mode))
            photo = self._photometric(warped, images, [None] * n)
            for i in range(n):
                photometric_losses[i].append(photo[i])
            if self.automask_loss:
                ref_scales = match_scales(ref_image, scale_shapes, n)
                unwarped = self._photometric(ref_scales, images, [None] * n)
                for i in range(n):
                    photometric_losses[i].append(unwarped[i])

        loss = self._reduce(photometric_losses)
        metrics = {'photometric_loss': loss}
        if self.smooth_loss_weight > 0.0:
            smooth = self._smoothness(inv_depths, images, n)
            metrics['smoothness_loss'] = smooth
            loss = loss + smooth
        return {'loss': loss, 'metrics': metrics}
