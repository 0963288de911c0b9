"""
SE(3) pose utilities (batched [B,4,4] matrices) as pure JAX functions plus a
lightweight pytree wrapper.

Math matched to the reference (packnet_sfm/geometry/pose_utils.py:8-60,
geometry/pose.py:8-99): euler(x,y,z) -> R = Rx @ Ry @ Rz, 6-vector layout
[tx,ty,tz,rx,ry,rz], pose inverse via transpose trick.
"""

import jax.numpy as jnp
from flax import struct


def euler2mat(angle):
    """[B,3] euler angles -> [B,3,3] rotation, R = Rx @ Ry @ Rz."""
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    B = angle.shape[0]
    zeros = jnp.zeros_like(z)
    ones = jnp.ones_like(z)

    cz, sz = jnp.cos(z), jnp.sin(z)
    zmat = jnp.stack([cz, -sz, zeros,
                      sz, cz, zeros,
                      zeros, zeros, ones], axis=1).reshape(B, 3, 3)

    cy, sy = jnp.cos(y), jnp.sin(y)
    ymat = jnp.stack([cy, zeros, sy,
                      zeros, ones, zeros,
                      -sy, zeros, cy], axis=1).reshape(B, 3, 3)

    cx, sx = jnp.cos(x), jnp.sin(x)
    xmat = jnp.stack([ones, zeros, zeros,
                      zeros, cx, -sx,
                      zeros, sx, cx], axis=1).reshape(B, 3, 3)

    return xmat @ ymat @ zmat


def pose_vec2mat(vec, mode='euler'):
    """[B,6] (trans+rot) -> [B,4,4] homogeneous transform."""
    if mode is None:
        return vec
    trans, rot = vec[:, :3], vec[:, 3:]
    if mode != 'euler':
        raise ValueError('Rotation mode not supported {}'.format(mode))
    R = euler2mat(rot)
    B = vec.shape[0]
    mat = jnp.tile(jnp.eye(4, dtype=vec.dtype), (B, 1, 1))
    mat = mat.at[:, :3, :3].set(R)
    mat = mat.at[:, :3, 3].set(trans)
    return mat


def invert_pose(T):
    """Invert [B,4,4] rigid transforms."""
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    Rt = jnp.swapaxes(R, -2, -1)
    tinv = -jnp.einsum('bij,bj->bi', Rt, t)
    B = T.shape[0]
    out = jnp.tile(jnp.eye(4, dtype=T.dtype), (B, 1, 1))
    out = out.at[:, :3, :3].set(Rt)
    out = out.at[:, :3, 3].set(tinv)
    return out


def transform_points(T, points):
    """Apply [B,4,4] to [B,H,W,3] (or [B,N,3]) points."""
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    if points.ndim == 4:
        out = jnp.einsum('bij,bhwj->bhwi', R, points) + t[:, None, None, :]
    elif points.ndim == 3:
        out = jnp.einsum('bij,bnj->bni', R, points) + t[:, None, :]
    else:
        raise ValueError('Unsupported points shape {}'.format(points.shape))
    return out


@struct.dataclass
class Pose:
    """Pytree wrapper for a batch of [B,4,4] transforms."""
    mat: jnp.ndarray

    @classmethod
    def identity(cls, B=1, dtype=jnp.float32):
        return cls(jnp.tile(jnp.eye(4, dtype=dtype), (B, 1, 1)))

    @classmethod
    def from_vec(cls, vec, mode='euler'):
        return cls(pose_vec2mat(vec, mode))

    def __len__(self):
        return self.mat.shape[0]

    def inverse(self):
        return Pose(invert_pose(self.mat))

    def compose(self, other):
        return Pose(self.mat @ other.mat)

    def transform(self, points):
        return transform_points(self.mat, points)

    def __matmul__(self, other):
        if isinstance(other, Pose):
            return self.compose(other)
        return self.transform(other)

    @property
    def translation(self):
        return self.mat[:, :3, 3]
