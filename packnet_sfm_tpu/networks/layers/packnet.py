"""
PackNet packing/unpacking layers (flax.linen, NHWC).

TPU re-design of the reference's signature ops
(reference: networks/layers/packnet/layers01.py):
- packing: space-to-depth as reshape/transpose (free in XLA)       (:126-148)
- PackLayerConv3d: space-to-depth -> Conv3D(1->d) over a depth axis ->
  flatten -> Conv2D+GN+ELU                                          (:213-247)
- UnpackLayerConv3d: Conv2D -> Conv3D -> pixel shuffle              (:250-286)
- Conv2D = conv + GroupNorm(16) + ELU                               (:10-37)
- ResidualConv/Block                                                (:40-95)
- InvDepth head = 3x3 conv + sigmoid / min_depth                    (:98-122)

Channel interleave order after the Conv3D flatten is d-major (j*C+c),
matching the reference's view(b, d*C, h, w) EXACTLY (layers01.py:240-247).
It must: on the unpack side the consumer is the FIXED pixel shuffle, so a
c-major order would not be reparameterization-equivalent and reference
checkpoints could not transport. (Layers trained against the pre-interop
c-major order are incompatible with current code — that order never
shipped in a release.)
"""


import jax
import jax.numpy as jnp
from flax import linen as nn

XAVIER = nn.initializers.glorot_uniform()


def packing(x, r=2):
    """Space-to-depth: [B,H,W,C] -> [B,H/r,W/r,C*r^2] (inverse of unpacking)."""
    B, H, W, C = x.shape
    oh, ow = H // r, W // r
    x = x.reshape(B, oh, r, ow, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # [B,oh,ow,C,ry,rx]
    return x.reshape(B, oh, ow, C * r * r)


def unpacking(x, r=2):
    """Depth-to-space (pixel shuffle): [B,H,W,C*r^2] -> [B,rH,rW,C]."""
    B, H, W, CR = x.shape
    C = CR // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # [B,H,ry,W,rx,C]
    return x.reshape(B, H * r, W * r, C)


class Conv2D(nn.Module):
    """conv(k, stride) + GroupNorm(16) + ELU, zero 'same' padding."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding=p,
                    kernel_init=XAVIER, dtype=self.dtype)(x)
        # epsilon matches torch GroupNorm (1e-5; flax defaults 1e-6) for
        # exact reference-checkpoint transport
        x = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=jnp.float32)(x)
        return nn.elu(x)


class ResidualConv(nn.Module):
    """Residual block: Conv2D(3,s) -> Conv2D(3,1) + 1x1 shortcut, GN + ELU."""
    features: int
    stride: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        y = Conv2D(self.features, 3, self.stride, self.dtype)(x)
        y = Conv2D(self.features, 3, 1, self.dtype)(y)
        shortcut = nn.Conv(self.features, (1, 1),
                           strides=(self.stride, self.stride),
                           kernel_init=XAVIER, dtype=self.dtype)(x)
        if self.dropout:
            shortcut = nn.Dropout(self.dropout, deterministic=not train)(shortcut)
        out = nn.GroupNorm(num_groups=16, epsilon=1e-5,
                           dtype=jnp.float32)(y + shortcut)
        return nn.elu(out)


class ResidualBlock(nn.Module):
    features: int
    num_blocks: int
    stride: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        x = ResidualConv(self.features, self.stride, self.dropout, self.dtype)(x, train)
        for _ in range(1, self.num_blocks):
            x = ResidualConv(self.features, 1, self.dropout, self.dtype)(x, train)
        return x


class InvDepth(nn.Module):
    """3x3 conv + sigmoid / min_depth head."""
    min_depth: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(1, (3, 3), padding=1, kernel_init=XAVIER,
                    dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32)) / self.min_depth


# module-level default for _Conv3DStack.impl, overridable for A/B benchmarks
# (flax bakes dataclass defaults at class creation, so benchmarks set this
# BEFORE model setup; both impls are numerically identical)
CONV3D_IMPL = 'depthwin2d'


class _Conv3DStack(nn.Module):
    """Conv3D(1->d) over (channel-as-depth, H, W) then flatten to channels.

    Two numerically-identical implementations (tests/test_networks parity):
    - 'conv3d':     the literal 3D conv — in_channels=1, so XLA's lowering
                    is MXU-hostile (27-element contraction)
    - 'depthwin2d': unfold the 3-wide depth window into input channels and
                    run ONE 2D conv with the depth axis merged into batch —
                    the same math as a dense 2D conv the MXU tiles well
                    (SURVEY.md §7 hard-part 4: "reshape into grouped 2-D
                    convs"). Weight layout: K2d[kh,kw,dz,j] = K3d[dz,kh,kw,0,j].

    Default picked by measurement on v5e (BENCH_NOTES.md).

    Output channels flatten D-MAJOR (k = j*C + c), matching the reference's
    `view(b, d*C, h, w)` (layers01.py:240-247) EXACTLY — this matters on the
    unpack side, where the consumer is the FIXED pixel shuffle: a c-major
    order is not reparameterization-equivalent, so reference PackNet
    checkpoints could not transport onto it. The permute is pure layout and
    fuses into the adjacent ops under XLA.
    """
    d: int = 8
    dtype: jnp.dtype = jnp.float32
    impl: str = 'depthwin2d'

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if self.impl == 'conv3d':
            v = x.transpose(0, 3, 1, 2)[..., None]     # [B,C,H,W,1] (C=depth)
            v = nn.Conv(self.d, (3, 3, 3), padding=1, kernel_init=XAVIER,
                        dtype=self.dtype)(v)           # [B,C,H,W,d]
            return v.transpose(0, 2, 3, 4, 1).reshape(B, H, W, self.d * C)
        if self.impl == 'depthwise':
            # Same math as three depthwise convs (feature_group_count=C,
            # channel multiplier d): y[..., c*d+j] =
            # sum_dz conv2d(x[..., c+dz], K[:, :, dz, j]) with the SAME
            # [3,3,d] kernel broadcast across channels. No [B,H,W,C,3]
            # window materialization and no B*C batch relayout — the
            # HBM-traffic diagnosis of depthwin2d's 205 ms/step. Kernel
            # layout [kh,kw,dz,j] matches the 'win2d' nn.Conv kernel, so
            # checkpoints remap by renaming win2d/{kernel,bias} ->
            # win2d_{kernel,bias}.
            kern = self.param('win2d_kernel', XAVIER, (3, 3, 3, self.d))
            bias = self.param('win2d_bias', nn.initializers.zeros,
                              (self.d,))
            kern = kern.astype(self.dtype)
            xp = jnp.pad(x.astype(self.dtype),
                         ((0, 0), (0, 0), (0, 0), (1, 1)))
            y = None
            for dz in range(3):
                # [3,3,d] tiled C times, c-major: rhs[..., c*d+j]=K[...,j]
                rhs = jnp.tile(kern[:, :, dz, :], (1, 1, C))[:, :, None, :]
                t = jax.lax.conv_general_dilated(
                    xp[..., dz:dz + C], rhs, (1, 1), 'SAME',
                    feature_group_count=C,
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                y = t if y is None else y + t
            y = y + jnp.tile(bias, C).astype(y.dtype)
            # grouped conv emits c-major; flatten d-major (see docstring)
            return y.reshape(B, H, W, C, self.d).transpose(
                0, 1, 2, 4, 3).reshape(B, H, W, self.d * C)
        # depth-window unfold: xw[..., c, k] = x_padded[..., c + k]
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1)))
        xw = jnp.stack([xp[..., 0:C], xp[..., 1:C + 1], xp[..., 2:C + 2]],
                       axis=-1)                        # [B,H,W,C,3]
        v = xw.transpose(0, 3, 1, 2, 4).reshape(B * C, H, W, 3)
        v = nn.Conv(self.d, (3, 3), padding=1, kernel_init=XAVIER,
                    dtype=self.dtype, name='win2d')(v)  # [B*C,H,W,d]
        v = v.reshape(B, C, H, W, self.d)
        return v.transpose(0, 2, 3, 4, 1).reshape(B, H, W, self.d * C)


class PackLayerConv3d(nn.Module):
    """pack(r) -> Conv3D(1->d) -> flatten -> Conv2D+GN+ELU back to C."""
    features: int              # = input channels (layer preserves C)
    kernel_size: int = 3
    r: int = 2
    d: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = packing(x, self.r)
        x = _Conv3DStack(self.d, self.dtype, impl=CONV3D_IMPL)(x)
        return Conv2D(self.features, self.kernel_size, 1, self.dtype)(x)


class UnpackLayerConv3d(nn.Module):
    """Conv2D to out*r^2/d -> Conv3D(1->d) -> pixel shuffle to out channels."""
    features: int              # output channels
    kernel_size: int = 3
    r: int = 2
    d: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2D(self.features * (self.r ** 2) // self.d,
                   self.kernel_size, 1, self.dtype)(x)
        x = _Conv3DStack(self.d, self.dtype, impl=CONV3D_IMPL)(x)
        return unpacking(x, self.r)
