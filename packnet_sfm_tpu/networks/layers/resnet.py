"""
ResNet encoder + monodepth2-style decoders (flax.linen, NHWC).

Re-designed for TPU from the reference's torchvision-based modules:
- ResnetEncoder with (x-0.45)/0.225 input normalization and multi-image first
  conv (reference: networks/layers/resnet/resnet_encoder.py:61-98)
- DepthDecoder: 5x {upconv -> nearest x2 -> skip concat -> upconv} with
  sigmoid disp heads (reference: networks/layers/resnet/depth_decoder.py:17-64)
- DualHeadDepthDecoder: shared trunk + integer/fractional sigmoid heads
  (reference: networks/layers/resnet/dual_head_depth_decoder.py:56-152)
- PoseDecoder (reference: networks/layers/resnet/pose_decoder.py:13-53)

TPU notes: convolutions run in NHWC (XLA's native TPU layout) and accept a
compute `dtype` (bfloat16 on pods) with fp32 params; BatchNorm runs in fp32.
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

KAIMING = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')
XAVIER = nn.initializers.glorot_uniform()


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=KAIMING,
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=KAIMING, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=KAIMING,
                               dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=jnp.float32)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is features * 4
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        out_features = self.features * 4
        residual = x

        def bn(z):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32)(z)

        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=KAIMING, dtype=self.dtype)(x)
        y = nn.relu(bn(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=KAIMING,
                    dtype=self.dtype)(y)
        y = nn.relu(bn(y))
        y = nn.Conv(out_features, (1, 1), use_bias=False,
                    kernel_init=KAIMING, dtype=self.dtype)(y)
        y = bn(y)
        if self.stride != 1 or x.shape[-1] != out_features:
            residual = nn.Conv(out_features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=KAIMING,
                               dtype=self.dtype)(x)
            residual = bn(residual)
        return nn.relu(y + residual)


RESNET_SPECS = {
    18: (BasicBlock, [2, 2, 2, 2]),
    34: (BasicBlock, [3, 4, 6, 3]),
    50: (Bottleneck, [3, 4, 6, 3]),
    101: (Bottleneck, [3, 4, 23, 3]),
    152: (Bottleneck, [3, 8, 36, 3]),
}


def resnet_num_ch_enc(num_layers):
    """Encoder channel counts per scale (reference: resnet_encoder.py:70,87)."""
    ch = [64, 64, 128, 256, 512]
    if num_layers > 34:
        ch = [ch[0]] + [c * 4 for c in ch[1:]]
    return ch


def max_pool_3x3_s2(x):
    """torch MaxPool2d(3, stride=2, padding=1) equivalent in NHWC."""
    import jax
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


class ResnetEncoder(nn.Module):
    """5-scale feature pyramid ResNet encoder with the reference's fixed input
    normalization. `num_input_images` stacks frames channel-wise (pose nets)."""
    num_layers: int = 18
    num_input_images: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        block, layers = RESNET_SPECS[self.num_layers]
        feats = []
        x = (x - 0.45) / 0.225
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=KAIMING, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(x)
        x = nn.relu(x)
        feats.append(x)
        x = max_pool_3x3_s2(x)
        widths = [64, 128, 256, 512]
        for stage, (width, n_blocks) in enumerate(zip(widths, layers)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = block(width, stride if b == 0 else 1, self.dtype)(x, train)
            feats.append(x)
        return feats


class ConvBlock(nn.Module):
    """3x3 conv (zero pad) + ReLU (reference: layers/resnet/layers.py:24-40)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, kernel_init=XAVIER,
                    dtype=self.dtype)(x)
        return nn.relu(x)


class Conv3x3(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding=1, kernel_init=XAVIER,
                       dtype=self.dtype)(x)


def _upsample2x(x):
    from packnet_sfm_tpu.ops.image import upsample2x_nearest
    return upsample2x_nearest(x)


class DepthDecoder(nn.Module):
    """monodepth2 decoder; returns {('disp', s): sigmoid [B,H,W,1]}."""
    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_features):
        num_ch_dec = [16, 32, 64, 128, 256]
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f'upconv_{i}_0')(x)
            x = _upsample2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f'upconv_{i}_1')(x)
            if i in self.scales:
                d = Conv3x3(self.num_output_channels, self.dtype,
                            name=f'dispconv_{i}')(x)
                outputs[('disp', i)] = nn.sigmoid(d.astype(jnp.float32))
        return outputs


class DualHeadDepthDecoder(nn.Module):
    """Shared trunk with integer+fractional sigmoid heads per scale
    (INT8-friendly dual-head design, reference: dual_head_depth_decoder.py)."""
    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    max_depth: float = 15.0
    use_skips: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_features):
        num_ch_dec = [16, 32, 64, 128, 256]
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f'upconv_{i}_0')(x)
            x = _upsample2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f'upconv_{i}_1')(x)
            if i in self.scales:
                i_raw = Conv3x3(1, self.dtype, name=f'integer_conv_{i}')(x)
                f_raw = Conv3x3(1, self.dtype, name=f'fractional_conv_{i}')(x)
                outputs[('integer', i)] = nn.sigmoid(i_raw.astype(jnp.float32))
                outputs[('fractional', i)] = nn.sigmoid(f_raw.astype(jnp.float32))
        return outputs


class PoseDecoder(nn.Module):
    """Axis-angle + translation decoder (reference: pose_decoder.py:13-53)."""
    num_ch_enc: Sequence[int]
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2
    stride: int = 1

    @nn.compact
    def __call__(self, input_features):
        # input_features: list over inputs, each a feature pyramid list
        last = [f[-1] for f in input_features]
        cat = [nn.relu(nn.Conv(256, (1, 1), name=f'squeeze_{i}')(f))
               for i, f in enumerate(last)]
        out = jnp.concatenate(cat, axis=-1)
        out = nn.relu(nn.Conv(256, (3, 3), strides=self.stride, padding=1,
                              name='pose_0')(out))
        out = nn.relu(nn.Conv(256, (3, 3), strides=self.stride, padding=1,
                              name='pose_1')(out))
        out = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1),
                      name='pose_2')(out)
        out = out.mean(axis=(1, 2))
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        axisangle = out[..., :3]
        translation = out[..., 3:]
        return axisangle, translation
