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
    """conv(k, stride) + GroupNorm(16) + ELU, zero 'same' padding.

    Setup-style with the compact-era child names ('Conv_0'/'GroupNorm_0')
    so checkpoints are unaffected; `conv_only`/`norm_act` expose the two
    halves for the fused pack layer (GroupNorm is a global per-sample
    statistic, so the linear conv is the only fusable part).
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        p = self.kernel_size // 2
        self.conv = nn.Conv(self.features,
                            (self.kernel_size, self.kernel_size),
                            strides=(self.stride, self.stride), padding=p,
                            kernel_init=XAVIER, dtype=self.dtype,
                            name='Conv_0')
        # epsilon matches torch GroupNorm (1e-5; flax defaults 1e-6) for
        # exact reference-checkpoint transport
        self.norm = nn.GroupNorm(num_groups=16, epsilon=1e-5,
                                 dtype=jnp.float32, name='GroupNorm_0')

    def conv_only(self, x):
        return self.conv(x)

    def norm_act(self, x):
        return nn.elu(self.norm(x))

    def __call__(self, x):
        return self.norm_act(self.conv(x))


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

    def setup(self):
        if self.impl == 'conv3d':
            self.conv3 = nn.Conv(self.d, (3, 3, 3), padding=1,
                                 kernel_init=XAVIER, dtype=self.dtype,
                                 name='Conv_0')
        else:
            # all 2D formulations share ONE param layout ([kh,kw,dz,j] +
            # [j]) so impl is a pure runtime choice — checkpoints move
            # between them unchanged and the fused pack layer can read
            # the weights directly
            self.win2d_kernel = self.param('win2d_kernel', XAVIER,
                                           (3, 3, 3, self.d))
            self.win2d_bias = self.param('win2d_bias',
                                         nn.initializers.zeros, (self.d,))

    def get_weights(self):
        """(kernel [kh,kw,dz,j], bias [j]) for the fused pack layer."""
        if self.impl == 'conv3d':
            raise ValueError(
                'fused pack layer requires a 2D CONV3D_IMPL '
                "('shifts'/'depthwise'/'grouped3'/'depthwin2d'), got "
                + self.impl)
        return self.win2d_kernel, self.win2d_bias

    def __call__(self, x):
        B, H, W, C = x.shape
        if self.impl == 'conv3d':
            v = x.transpose(0, 3, 1, 2)[..., None]     # [B,C,H,W,1] (C=depth)
            v = self.conv3(v)                          # [B,C,H,W,d]
            return v.transpose(0, 2, 3, 4, 1).reshape(B, H, W, self.d * C)
        if self.impl == 'grouped3':
            # ONE grouped conv, no B*C batch relayout and no trailing-8
            # lane dim (the two layout poisons measured in the r5 profile:
            # 47 ms/step of copy/reshape/slice/pad under depthwin2d).
            # Window the depth axis into the lane dim ([B,H,W,3C], c-major
            # (c,dz)), then conv with feature_group_count=C and the SAME
            # [3,3,3,d] kernel tiled across groups — per-group in=3,
            # out=d, output lanes 8C. The tile broadcast's VJP sums the
            # per-group weight grads back to [3,3,3,d] automatically.
            kern, bias = self.win2d_kernel, self.win2d_bias
            xp = jnp.pad(x.astype(self.dtype),
                         ((0, 0), (0, 0), (0, 0), (1, 1)))
            xw = jnp.stack([xp[..., 0:C], xp[..., 1:C + 1],
                            xp[..., 2:C + 2]], axis=-1)   # [B,H,W,C,3]
            xw = xw.reshape(B, H, W, C * 3)
            rhs = jnp.tile(kern.astype(self.dtype).reshape(3, 3, 3, 1,
                                                           self.d),
                           (1, 1, 1, C, 1))               # [3,3,3,C,d]
            rhs = rhs.reshape(3, 3, 3, C * self.d)        # out (c,j) c-major
            y = jax.lax.conv_general_dilated(
                xw, rhs, (1, 1), 'SAME', feature_group_count=C,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            y = y + jnp.tile(bias.astype(y.dtype), C)
            # grouped output is c-major (c,j); flatten d-major (docstring)
            return y.reshape(B, H, W, C, self.d).transpose(
                0, 1, 2, 4, 3).reshape(B, H, W, self.d * C)
        if self.impl == 'shifts':
            # Bandwidth-first formulation: the op is ~27 GF/layer with the
            # SAME [3,3,3,d] kernel broadcast across all C channels, so it
            # is HBM-bound, not MXU work. Each output block j (d-major:
            # y[..., j*C:(j+1)*C]) is a 27-term scalar-weighted sum of
            # spatially/depth-shifted slices of ONE zero-padded copy of x —
            # pure elementwise adds that XLA fuses into a single pass with
            # the lane dim kept at C (no [B,H,W,C,3] window tensor, no
            # B*C batch relayout, no grouped conv trailing-1 padding:
            # those are the failure modes of the other three impls,
            # artifacts/bench_r5/packnet_ab.err). Kernel layout
            # [kh,kw,dz,j] identical to 'depthwise', so checkpoints
            # transport unchanged.
            kern, bias = self.win2d_kernel, self.win2d_bias
            kern = kern.astype(self.dtype)
            xp = jnp.pad(x.astype(self.dtype),
                         ((0, 0), (1, 1), (1, 1), (1, 1)))
            blocks = []
            for j in range(self.d):
                acc = None
                for dz in range(3):
                    for kh in range(3):
                        for kw in range(3):
                            t = (xp[:, kh:kh + H, kw:kw + W, dz:dz + C]
                                 * kern[kh, kw, dz, j])
                            acc = t if acc is None else acc + t
                blocks.append(acc + bias[j].astype(acc.dtype))
            return jnp.concatenate(blocks, axis=-1)
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
            kern, bias = self.win2d_kernel, self.win2d_bias
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
        v = jax.lax.conv_general_dilated(
            v.astype(self.dtype),
            self.win2d_kernel.astype(self.dtype), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))  # [B*C,H,W,d]
        v = v + self.win2d_bias.astype(v.dtype)
        v = v.reshape(B, C, H, W, self.d)
        return v.transpose(0, 2, 3, 4, 1).reshape(B, H, W, self.d * C)


# Fuse the pack layer's Conv3DStack into the following Conv2D as ONE dense
# conv (see _fused_pack_conv). Module-level like CONV3D_IMPL so benches can
# A/B; requires an explicit-param CONV3D_IMPL.
PACK_FUSED = False


def _compose_pack_weights(kern, bias, w2, C):
    """Compose the stack kernel [3,3,dz,j] with the Conv2D kernel
    [k,k,8C,F] into one dense conv kernel [k+2,k+2,C,F] plus the constant
    channel offset the stack bias contributes through the conv.

    The stack is linear: y[p, jC+c] = sum_dz K[kh',kw',dz,j]
    x[p+kh'-1, p+kw'-1, c+dz-1] (zero outside [0,C)), so
    conv_k(y) == conv_{k+2}(x, W_eff) wherever the conv never reads the
    zero-padded border of y. W_eff[kh+kh', kw+kw', c+dz-1, f] +=
    W2[kh,kw,jC+c,f] * K[kh',kw',dz,j]; terms with c+dz-1 outside [0,C)
    drop (that is the stack's channel zero-pad).
    """
    k = w2.shape[0]
    F = w2.shape[-1]
    d = kern.shape[-1]
    w2r = w2.reshape(k, k, d, C, F)                      # d-major (j, c)
    acc = jnp.zeros((k + 2, k + 2, C + 2, F), w2.dtype)
    for kh2 in range(3):
        for kw2 in range(3):
            for dz in range(3):
                contrib = jnp.einsum('abjcf,j->abcf', w2r,
                                     kern[kh2, kw2, dz])
                acc = acc.at[kh2:kh2 + k, kw2:kw2 + k,
                             dz:dz + C].add(contrib)
    w_eff = acc[:, :, 1:C + 1]
    # stack bias rides every (j,c) channel of y; through the conv it is a
    # constant per-F offset in the interior (strips handle their own)
    b_const = jnp.einsum('abjcf,j->f', w2r, bias)
    return w_eff, b_const


class PackLayerConv3d(nn.Module):
    """pack(r) -> Conv3D(1->d) -> flatten -> Conv2D+GN+ELU back to C.

    With PACK_FUSED, the interior output is ONE dense (k+2)x(k+2) C->F
    conv with the composed kernel — ~4x fewer FLOPs than the two-stage
    pair on the big layers (pack1 at 192x640 bs8: 1.61 TF -> 0.39 TF) and
    the 8C intermediate is never materialized. Zero-padding semantics
    differ from the two-stage form only where the conv reads the stack
    output's zero border, i.e. an m=k//2 output ring, which is recomputed
    EXACTLY via the two-stage path on 2m-thin strips (~3% of pixels).
    Same params either way: checkpoints transport unchanged.
    """
    features: int              # = input channels (layer preserves C)
    kernel_size: int = 3
    r: int = 2
    d: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = packing(x, self.r)
        stack = _Conv3DStack(self.d, self.dtype, impl=CONV3D_IMPL)
        conv2d = Conv2D(self.features, self.kernel_size, 1, self.dtype)
        B, H, W, C = x.shape
        k = self.kernel_size
        m = k // 2
        # two-stage path: fused off, literal-3D impl, or too small for the
        # border strips (tiny feature maps are cheap either way)
        if (not PACK_FUSED or CONV3D_IMPL == 'conv3d'
                or H < 4 * m or W < 4 * m):
            return conv2d(stack(x))
        # --- exact border ring via the two-stage path on thin strips.
        # z[q] with dist(q, border) < m reads the zero-padded border of
        # the stack output y; y rows/cols needed are only the REAL
        # 0..2m-1 band (beyond that the conv's own zero pad applies),
        # computed from x bands of 2m+1 (stack pads its outermost row
        # itself). conv_only's SAME pad supplies the y zero border.
        top = conv2d.conv_only(stack(x[:, :2 * m + 1])[:, :2 * m])[:, :m]
        bot = conv2d.conv_only(
            stack(x[:, H - 2 * m - 1:])[:, 1:])[:, m:]
        left = conv2d.conv_only(
            stack(x[:, :, :2 * m + 1])[:, :, :2 * m])[:, :, :m]
        right = conv2d.conv_only(
            stack(x[:, :, W - 2 * m - 1:])[:, :, 1:])[:, :, m:]

        # --- interior: one composed dense conv
        kern, sbias = stack.get_weights()
        w2 = conv2d.conv.variables['params']['kernel']
        b2 = conv2d.conv.variables['params']['bias']
        w_eff, b_const = _compose_pack_weights(kern, sbias, w2, C)
        z = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w_eff.astype(self.dtype), (1, 1),
            [(m + 1, m + 1), (m + 1, m + 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        z = z + (b2 + b_const).astype(z.dtype)
        z = z.at[:, :m].set(top.astype(z.dtype))
        z = z.at[:, H - m:].set(bot.astype(z.dtype))
        z = z.at[:, :, :m].set(left.astype(z.dtype))
        z = z.at[:, :, W - m:].set(right.astype(z.dtype))
        return conv2d.norm_act(z)


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
