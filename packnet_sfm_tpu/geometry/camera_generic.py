"""
Generic (learned ray-surface) camera with softmax projection.

TPU re-design of the reference GenericCamera
(reference: geometry/camera_generic.py:17-208):
- reconstruct: P(x,y) = d(x,y) * r(x,y) with the learned per-pixel ray
- project: for each target ray direction, softmax-match against the rays in a
  (2p+1)^2 patch of the reference ray surface around the pixel, with an
  annealed temperature; the expected patch coordinate is the projection.
  Computed at half resolution and upsampled (:159-208).

TPU-first notes: the patch coordinate table is built in numpy at trace time
(shapes are static), the patch gather is one take_along_axis, and the
direction-vs-patch dot product is a single batched matmul on the MXU.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from packnet_sfm_tpu.geometry.pose import Pose
from packnet_sfm_tpu.ops.image import interpolate


def _patch_coords(H, W, p):
    """[H*W, K, 2] int32 in-bounds patch coordinates (numpy, trace-time).

    Patches are shifted (not clamped) to stay inside the image, matching the
    reference's shift logic (camera_generic.py:133-148).
    """
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
    centers = np.stack([gy.ravel(), gx.ravel()], 1)            # [HW,2] (row,col)
    off = np.arange(-p, p + 1)
    oy, ox = np.meshgrid(off, off, indexing='ij')
    patch = np.stack([oy.ravel(), ox.ravel()], 1)              # [K,2]
    coords = centers[:, None, :] + patch[None, :, :]           # [HW,K,2]
    # shift whole patch in-bounds per axis
    for a, size in ((0, H), (1, W)):
        low = coords[:, 0, a]
        coords[:, :, a] -= np.minimum(low, 0)[:, None]
        high = coords[:, -1, a]
        coords[:, :, a] -= np.maximum(high - (size - 1), 0)[:, None]
    return coords.astype(np.int32)


@struct.dataclass
class GenericCamera:
    """ray_surface: [B,H,W,3] unit rays; Tcw: camera->world pose."""
    ray_surface: jnp.ndarray
    Tcw: Pose
    patch_side: int = struct.field(pytree_node=False, default=20)

    @classmethod
    def create(cls, ray_surface, Tcw=None, patch_side=20):
        if Tcw is None:
            Tcw = Pose.identity(ray_surface.shape[0], ray_surface.dtype)
        return cls(ray_surface=ray_surface, Tcw=Tcw, patch_side=patch_side)

    @property
    def Twc(self):
        return self.Tcw.inverse()

    def reconstruct(self, depth, frame='w'):
        Xc = self.ray_surface * depth
        if frame == 'c':
            return Xc
        if frame == 'w':
            return self.Twc @ Xc
        raise ValueError('Unknown reference frame {}'.format(frame))

    def project(self, X, progress=0.0, downsample=True, frame='c'):
        """Softmax patch projection -> [-1,1] grid coords [B,H,W,2]."""
        B, H, W, _ = X.shape
        if frame == 'w':
            X = self.Tcw @ X

        ray = self.ray_surface
        direction = X
        if downsample:
            H2, W2 = H // 2, W // 2
            ray = interpolate(ray, (H2, W2), 'bilinear', True)
            direction = interpolate(direction, (H2, W2), 'bilinear', True)
        else:
            H2, W2 = H, W

        p = self.patch_side
        K = (2 * p + 1) ** 2
        coords = jnp.asarray(_patch_coords(H2, W2, p))          # [HW,K,2]
        flat_idx = coords[..., 0] * W2 + coords[..., 1]         # [HW,K]

        ray_flat = ray.reshape(B, H2 * W2, 3)
        patch_rays = jnp.take(ray_flat, flat_idx.reshape(-1),
                              axis=1).reshape(B, H2 * W2, K, 3)

        d = direction.reshape(B, H2 * W2, 3)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        logits = jnp.einsum('bnc,bnkc->bnk', d, patch_rays)

        # annealed softmax temperature (camera_generic.py:117-119,190-192);
        # jit-safe: progress may be traced
        min_temp, start_temp, constant = 1e-8, 1e-4, 0.1
        temperature = jnp.maximum(
            min_temp,
            start_temp / jnp.exp(constant * jnp.asarray(progress,
                                                        jnp.float32)))
        w = jax.nn.softmax(logits / temperature, axis=-1)

        expected = jnp.einsum('bnk,nkc->bnc', w, coords.astype(jnp.float32))
        rows = expected[..., 0].reshape(B, H2, W2)
        cols = expected[..., 1].reshape(B, H2, W2)
        xnorm = 2.0 * rows / (H2 - 1) - 1.0   # row-normalized (reference naming)
        ynorm = 2.0 * cols / (W2 - 1) - 1.0

        if downsample:
            xnorm = interpolate(xnorm[..., None], (H, W), 'bilinear',
                                True)[..., 0]
            ynorm = interpolate(ynorm[..., None], (H, W), 'bilinear',
                                True)[..., 0]
        # grid_sample expects (x=col, y=row) (reference: returns [Ynorm, Xnorm])
        return jnp.stack([ynorm, xnorm], axis=-1)


def pinhole_ray_surface(K, H, W, dtype=jnp.float32):
    """Canonical pinhole ray template from intrinsics (unit-normalized).

    TPU-native replacement for the reference's .npy ray template file
    (generic_multiview_photometric_loss.py:146-148) when none is provided.
    """
    from packnet_sfm_tpu.geometry.camera import Camera, image_grid
    cam = Camera.create(K)
    B = cam.K.shape[0]
    grid = image_grid(B, H, W, dtype)
    rays = jnp.einsum('bij,bhwj->bhwi', cam.Kinv, grid)
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
