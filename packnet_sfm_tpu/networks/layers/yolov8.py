"""
YOLOv8 (CSPDarknet) backbone layers, implemented natively in flax/NHWC.

The reference loads an ultralytics .pt backbone and probes its channels at
runtime (reference: networks/layers/yolov8/yolov8_backbone.py:91,
networks/depth/YOLOv8SAN01.py:219-266). Ultralytics isn't a dependency here:
the backbone is re-implemented (Conv-BN-SiLU, C2f, SPPF) with the standard
width/depth multiples per variant; COCO/ImageNet weight import is gated on a
provided state dict.
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

KAIMING = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')

# (depth_multiple, width_multiple, max_channels)
YOLOV8_VARIANTS = {
    'n': (0.33, 0.25, 1024),
    's': (0.33, 0.50, 1024),
    'm': (0.67, 0.75, 768),
    'l': (1.00, 1.00, 512),
    'x': (1.00, 1.25, 512),
}


def _make_divisible(x, div=8):
    return max(div, int(round(x / div) * div))


class ConvBnSiLU(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        p = self.kernel_size // 2
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride), padding=p,
                    use_bias=False, kernel_init=KAIMING, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=jnp.float32)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        y = ConvBnSiLU(self.features, 3, 1, self.dtype)(x, train)
        y = ConvBnSiLU(self.features, 3, 1, self.dtype)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8 signature block)."""
    features: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        c = self.features // 2
        y = ConvBnSiLU(2 * c, 1, 1, self.dtype)(x, train)
        parts = list(jnp.split(y, 2, axis=-1))
        for _ in range(self.n):
            parts.append(Bottleneck(c, self.shortcut,
                                    self.dtype)(parts[-1], train))
        out = jnp.concatenate(parts, axis=-1)
        return ConvBnSiLU(self.features, 1, 1, self.dtype)(out, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max-pools."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        import jax
        c = self.features // 2
        x = ConvBnSiLU(c, 1, 1, self.dtype)(x, train)

        def pool5(v):
            return jax.lax.reduce_window(
                v, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
                ((0, 0), (2, 2), (2, 2), (0, 0)))
        p1 = pool5(x)
        p2 = pool5(p1)
        p3 = pool5(p2)
        out = jnp.concatenate([x, p1, p2, p3], axis=-1)
        return ConvBnSiLU(self.features, 1, 1, self.dtype)(out, train)


class YOLOv8Backbone(nn.Module):
    """5-scale feature pyramid at strides /2,/4,/8,/16,/32."""
    variant: str = 's'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        d, w, maxc = YOLOV8_VARIANTS[self.variant]
        chs = [_make_divisible(min(c, maxc) * w)
               for c in (64, 128, 256, 512, 1024)]
        reps = [max(1, round(n * d)) for n in (3, 6, 6, 3)]

        feats = []
        x = ConvBnSiLU(chs[0], 3, 2, self.dtype)(x, train)     # /2
        feats.append(x)
        x = ConvBnSiLU(chs[1], 3, 2, self.dtype)(x, train)     # /4
        x = C2f(chs[1], reps[0], True, self.dtype)(x, train)
        feats.append(x)
        x = ConvBnSiLU(chs[2], 3, 2, self.dtype)(x, train)     # /8
        x = C2f(chs[2], reps[1], True, self.dtype)(x, train)
        feats.append(x)
        x = ConvBnSiLU(chs[3], 3, 2, self.dtype)(x, train)     # /16
        x = C2f(chs[3], reps[2], True, self.dtype)(x, train)
        feats.append(x)
        x = ConvBnSiLU(chs[4], 3, 2, self.dtype)(x, train)     # /32
        x = C2f(chs[4], reps[3], True, self.dtype)(x, train)
        x = SPPF(chs[4], self.dtype)(x, train)
        feats.append(x)
        return feats


class DepthNeck(nn.Module):
    """Light top-down FPN fusion over the backbone pyramid
    (reference: YOLOv8Neck/DepthNeck options, YOLOv8SAN01.py:268-282)."""
    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train=True):
        from packnet_sfm_tpu.ops.image import upsample2x_nearest
        out = list(feats)
        for i in range(len(feats) - 2, -1, -1):
            up = upsample2x_nearest(out[i + 1])
            up = ConvBnSiLU(feats[i].shape[-1], 1, 1,
                            self.dtype)(up, train)
            out[i] = C2f(feats[i].shape[-1], 1, False, self.dtype)(
                jnp.concatenate([out[i], up], axis=-1), train)
        return out
