"""
Differentiable camera models (pinhole + VADAS fisheye) as JAX pytrees.

Math matched to the reference (packnet_sfm/geometry/camera.py):
- pinhole reconstruct/project with Kinv lifting and [-1,1] grid coords
  (camera.py:111-190)
- VADAS fisheye: theta = atan(r), 7-term polynomial theta->r_d, scale s /
  div and principal point ux/uy; approximate inverse (theta ~= r_d) for
  reconstruction (camera.py:242-394)
- intrinsics rescaling with the +0.5/-0.5 pixel-center convention
  (camera_utils.py:16-22, multiview_photometric_loss.py:166-184)

Layout: depth maps are [B,H,W,1]; 3D points are [B,H,W,3].
"""

import jax.numpy as jnp
from flax import struct

from packnet_sfm_tpu.geometry.pose import Pose


def image_grid(B, H, W, dtype=jnp.float32):
    """Pixel-coordinate homogeneous grid [B,H,W,3] with (u=x, v=y, 1)."""
    xs = jnp.arange(W, dtype=dtype)
    ys = jnp.arange(H, dtype=dtype)
    u = jnp.broadcast_to(xs[None, :], (H, W))
    v = jnp.broadcast_to(ys[:, None], (H, W))
    grid = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)
    return jnp.broadcast_to(grid[None], (B, H, W, 3))


def scale_intrinsics(K, x_scale, y_scale):
    """Scale [B,3,3] intrinsics (pixel-center convention)."""
    K = K.at[..., 0, 0].mul(x_scale)
    K = K.at[..., 1, 1].mul(y_scale)
    K = K.at[..., 0, 2].set((K[..., 0, 2] + 0.5) * x_scale - 0.5)
    K = K.at[..., 1, 2].set((K[..., 1, 2] + 0.5) * y_scale - 0.5)
    return K


def construct_K(fx, fy, cx, cy, dtype=jnp.float32):
    return jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=dtype)


@struct.dataclass
class Camera:
    """Pinhole camera: intrinsics [B,3,3] + camera->world pose."""
    K: jnp.ndarray
    Tcw: Pose

    @classmethod
    def create(cls, K, Tcw=None):
        if K.ndim == 2:
            K = K[None]
        if Tcw is None:
            Tcw = Pose.identity(K.shape[0], K.dtype)
        return cls(K=K, Tcw=Tcw)

    def __len__(self):
        return self.K.shape[0]

    @property
    def fx(self):
        return self.K[:, 0, 0]

    @property
    def fy(self):
        return self.K[:, 1, 1]

    @property
    def cx(self):
        return self.K[:, 0, 2]

    @property
    def cy(self):
        return self.K[:, 1, 2]

    @property
    def Twc(self):
        return self.Tcw.inverse()

    @property
    def Kinv(self):
        """Closed-form inverse of the calibration matrix."""
        K = self.K
        zeros = jnp.zeros_like(self.fx)
        ones = jnp.ones_like(self.fx)
        row0 = jnp.stack([1.0 / self.fx, zeros, -self.cx / self.fx], axis=-1)
        row1 = jnp.stack([zeros, 1.0 / self.fy, -self.cy / self.fy], axis=-1)
        row2 = jnp.stack([zeros, zeros, ones], axis=-1)
        return jnp.stack([row0, row1, row2], axis=1).astype(K.dtype)

    def scaled(self, x_scale, y_scale=None):
        if y_scale is None:
            y_scale = x_scale
        if x_scale == 1.0 and y_scale == 1.0:
            return self
        return Camera(K=scale_intrinsics(self.K, x_scale, y_scale), Tcw=self.Tcw)

    def reconstruct(self, depth, frame='w'):
        """Lift [B,H,W,1] depth to [B,H,W,3] points in camera/world frame."""
        B, H, W, _ = depth.shape
        grid = image_grid(B, H, W, depth.dtype)
        xnorm = jnp.einsum('bij,bhwj->bhwi', self.Kinv, grid)
        Xc = xnorm * depth
        if frame == 'c':
            return Xc
        if frame == 'w':
            return self.Twc @ Xc
        raise ValueError('Unknown reference frame {}'.format(frame))

    def project(self, X, frame='w'):
        """Project [B,H,W,3] points to normalized [-1,1] coords [B,H,W,2]."""
        B, H, W, _ = X.shape
        if frame == 'w':
            Xc = self.Tcw @ X
        elif frame == 'c':
            Xc = X
        else:
            raise ValueError('Unknown reference frame {}'.format(frame))
        pix = jnp.einsum('bij,bhwj->bhwi', self.K, Xc)
        Z = jnp.clip(pix[..., 2], a_min=1e-5)
        Xn = 2.0 * (pix[..., 0] / Z) / (W - 1) - 1.0
        Yn = 2.0 * (pix[..., 1] / Z) / (H - 1) - 1.0
        return jnp.stack([Xn, Yn], axis=-1)


@struct.dataclass
class FisheyeCamera:
    """
    VADAS fisheye camera. Intrinsics: k [B,7] polynomial, s/div scale factors
    [B], ux/uy principal point [B]. Static image_size (H, W) for projection
    normalization.
    """
    k: jnp.ndarray
    s: jnp.ndarray
    div: jnp.ndarray
    ux: jnp.ndarray
    uy: jnp.ndarray
    Tcw: Pose
    image_size: tuple = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, intrinsics, Tcw=None, image_size=None):
        k = jnp.atleast_2d(jnp.asarray(intrinsics['k']))
        B = k.shape[0]

        def vec(x):
            return jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(x)), (B,))

        if Tcw is None:
            Tcw = Pose.identity(B, k.dtype)
        return cls(k=k, s=vec(intrinsics['s']), div=vec(intrinsics['div']),
                   ux=vec(intrinsics['ux']), uy=vec(intrinsics['uy']),
                   Tcw=Tcw, image_size=image_size)

    def __len__(self):
        return self.k.shape[0]

    @property
    def Twc(self):
        return self.Tcw.inverse()

    def scaled_to(self, DH, DW, H, W):
        """Rescale the principal point for a (DH, DW) pyramid level of an
        (H, W) image (reference: multiview_photometric_loss.py:159-187)."""
        sw = DW / float(W)
        sh = DH / float(H)
        return FisheyeCamera(
            k=self.k, s=self.s, div=self.div,
            ux=(self.ux + 0.5) * sw - 0.5,
            uy=(self.uy + 0.5) * sh - 0.5,
            Tcw=self.Tcw, image_size=(DH, DW))

    def reconstruct(self, depth, frame='w'):
        """Approximate inverse VADAS projection (theta ~= r_d), then lift."""
        B, H, W, _ = depth.shape
        grid = image_grid(B, H, W, depth.dtype)
        u = grid[..., 0]
        v = grid[..., 1]
        x_dist = (u - self.ux[:, None, None]) / self.s[:, None, None]
        y_dist = (v - self.uy[:, None, None]) / self.div[:, None, None]
        r_d = jnp.sqrt(x_dist ** 2 + y_dist ** 2)
        theta = r_d  # polynomial inverse approximation (reference camera.py:268)
        r = jnp.tan(theta)
        r_d_safe = jnp.maximum(r_d, jnp.finfo(depth.dtype).eps)
        x_norm = (r / r_d_safe) * x_dist
        y_norm = (r / r_d_safe) * y_dist
        d = depth[..., 0]
        Xc = jnp.stack([x_norm * d, y_norm * d, d], axis=-1)
        if frame == 'c':
            return Xc
        if frame == 'w':
            return self.Twc @ Xc
        raise ValueError('Unknown reference frame {}'.format(frame))

    def project(self, X, frame='w'):
        """VADAS forward projection to [-1,1] normalized coords [B,H,W,2]."""
        B, H, W, _ = X.shape
        if self.image_size is not None:
            H, W = self.image_size
        if frame == 'w':
            Xc = self.Tcw @ X
        elif frame == 'c':
            Xc = X
        else:
            raise ValueError('Unknown reference frame {}'.format(frame))
        eps = jnp.finfo(X.dtype).eps
        Z = jnp.clip(Xc[..., 2], a_min=eps)
        x_norm = Xc[..., 0] / Z
        y_norm = Xc[..., 1] / Z
        # Safe sqrt: grad of sqrt(0) is NaN; the 1e-18 floor changes the
        # forward value only at the exact principal-point ray.
        r = jnp.sqrt(x_norm ** 2 + y_norm ** 2 + 1e-18)
        theta = jnp.arctan(r)
        # 7-term polynomial in theta (Horner form for VPU efficiency)
        k = self.k  # [B,7]
        theta_poly = k[:, 6][:, None, None]
        for i in range(5, -1, -1):
            theta_poly = theta_poly * theta + k[:, i][:, None, None]
        r_d = theta_poly
        r_safe = jnp.maximum(r, eps)
        x_dist = (r_d / r_safe) * x_norm
        y_dist = (r_d / r_safe) * y_norm
        u = self.s[:, None, None] * x_dist + self.ux[:, None, None]
        v = self.div[:, None, None] * y_dist + self.uy[:, None, None]
        u_n = 2.0 * u / (W - 1) - 1.0
        v_n = 2.0 * v / (H - 1) - 1.0
        return jnp.stack([u_n, v_n], axis=-1)
