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


def _window_starts(n, p):
    """Per-pixel window start along one axis (numpy, trace-time): the same
    shift-in-bounds rule as _patch_coords, i.e. start = the first coordinate
    of the shifted (2p+1)-wide window centered at each pixel."""
    k1 = 2 * p + 1
    s = np.maximum(np.arange(n) - p, 0)
    s = s - np.maximum(s + k1 - n, 0)   # may go negative when k1 > n,
    return s.astype(np.int32)           # matching _patch_coords exactly


def _project_expected_streaming(ray_flat, d, sy, sx, p, W2, temperature):
    """Expected patch (row, col) per pixel via an ONLINE softmax streamed
    over window rows — never materializes the [B, HW, K, 3] patch tensor
    the dense path builds (K = (2p+1)^2 = 1681 at the reference's p=20,
    reference camera_generic.py:159-208).

    Flash-attention-style recurrence: carry a running max m, normalizer s,
    and coordinate numerators (ey, ex), rescaling by exp(m - m_new) as the
    max updates. One lax.scan step = one window row ((2p+1) candidates),
    so peak memory is K^(1/2) of the dense path; the scan body is
    rematerialized (jax.checkpoint) so backward recomputes the gathers
    instead of saving per-row logits.

    Returns (rows, cols): [B, HW] fp32 expected patch coordinates.
    """
    B, N, _ = d.shape
    k1 = 2 * p + 1
    joff = jnp.arange(k1, dtype=jnp.int32)
    cols = sx[:, None] + joff[None, :]                    # [N,k1]
    colf = cols.astype(jnp.float32)
    temperature = jnp.asarray(temperature, jnp.float32)

    def body(carry, i):
        m, s, ey, ex = carry
        r = sy + i                                        # [N] window row
        idx = (r[:, None] * W2 + cols).reshape(-1)        # [N*k1]
        patch = jnp.take(ray_flat, idx, axis=1).reshape(B, N, k1, 3)
        logits = (jnp.einsum('bnc,bnkc->bnk', d, patch)
                  .astype(jnp.float32) / temperature)
        m_new = jnp.maximum(m, logits.max(-1))
        alpha = jnp.exp(m - m_new)
        pexp = jnp.exp(logits - m_new[..., None])
        psum = pexp.sum(-1)
        s_new = s * alpha + psum
        ey_new = ey * alpha + r.astype(jnp.float32)[None] * psum
        ex_new = ex * alpha + (pexp * colf[None]).sum(-1)
        return (m_new, s_new, ey_new, ex_new), None

    init = (jnp.full((B, N), -jnp.inf, jnp.float32),
            jnp.zeros((B, N), jnp.float32),
            jnp.zeros((B, N), jnp.float32),
            jnp.zeros((B, N), jnp.float32))
    (m, s, ey, ex), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(k1, dtype=jnp.int32))
    return ey / s, ex / s


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

    def project(self, X, progress=0.0, downsample=True, frame='c',
                backend=None):
        """Softmax patch projection -> [-1,1] grid coords [B,H,W,2].

        `backend` selects the softmax-match formulation (all numerically
        equivalent; parity-tested):
        - 'dense': one [B, HW, K, 3] patch gather + softmax. 620 MB/image
          at half-res with the reference's patch_side=20 — why the
          reference pins this model to half resolution
          (camera_generic.py:159-208). Fastest for small images.
        - 'streaming': online-softmax lax.scan over window rows; peak
          memory drops by sqrt(K), making full-resolution feasible.
        - 'pallas': TPU kernel holding the whole ray plane in VMEM — HBM
          traffic drops ~K (ops/pallas/generic_projection.py); forward/
          eval path, backward falls back to an XLA recompute.
        - None (auto): dense below ~16M patch entries; above, 'pallas'
          on TPU when the window fits, else 'streaming'."""
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
        if backend is None:
            if H2 * W2 * K <= (1 << 24):
                backend = 'dense'
            elif (jax.default_backend() == 'tpu' and H2 >= 2 * p + 1
                  and W2 >= 2 * p + 1):
                backend = 'pallas'
            else:
                backend = 'streaming'

        ray_flat = ray.reshape(B, H2 * W2, 3)
        d = direction.reshape(B, H2 * W2, 3)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)

        # annealed softmax temperature (camera_generic.py:117-119,190-192);
        # jit-safe: progress may be traced
        min_temp, start_temp, constant = 1e-8, 1e-4, 0.1
        temperature = jnp.maximum(
            min_temp,
            start_temp / jnp.exp(constant * jnp.asarray(progress,
                                                        jnp.float32)))

        if backend == 'pallas':
            from packnet_sfm_tpu.ops.pallas.generic_projection import (
                expected_patch_coords)
            ray_p = jnp.moveaxis(ray.astype(jnp.float32), -1, 1)
            d_p = jnp.moveaxis(
                (d / temperature).reshape(B, H2, W2, 3).astype(jnp.float32),
                -1, 1)
            interpret = jax.default_backend() != 'tpu'
            rows, cols = expected_patch_coords(ray_p, d_p, p, interpret)
        elif backend == 'streaming':
            sy = jnp.asarray(np.repeat(_window_starts(H2, p), W2))  # [HW]
            sx = jnp.asarray(np.tile(_window_starts(W2, p), H2))    # [HW]
            erow, ecol = _project_expected_streaming(
                ray_flat, d, sy, sx, p, W2, temperature)
            rows = erow.reshape(B, H2, W2)
            cols = ecol.reshape(B, H2, W2)
        else:
            coords = jnp.asarray(_patch_coords(H2, W2, p))      # [HW,K,2]
            flat_idx = coords[..., 0] * W2 + coords[..., 1]     # [HW,K]
            patch_rays = jnp.take(ray_flat, flat_idx.reshape(-1),
                                  axis=1).reshape(B, H2 * W2, K, 3)
            logits = jnp.einsum('bnc,bnkc->bnk', d, patch_rays)
            w = jax.nn.softmax(logits / temperature, axis=-1)
            expected = jnp.einsum('bnk,nkc->bnc', w,
                                  coords.astype(jnp.float32))
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
