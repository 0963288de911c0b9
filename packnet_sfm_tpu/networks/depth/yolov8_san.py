"""
YOLOv8SAN01: YOLOv8 backbone + 1x1 adapters to the ResNet channel layout +
standard DepthDecoder + optional SAN LiDAR branch with FiLM fusion.

TPU re-design of reference networks/depth/YOLOv8SAN01.py:195-634:
- backbone features adapted to [64, 64, 128, 256, 512] with 1x1 convs so the
  monodepth2 DepthDecoder is reused unchanged (:286-301)
- optional neck (DepthNeck FPN) before adaptation (:268-282)
- Minkowski-SAN branch + FiLM + sigmoid-gated learnable fusion identical to
  ResNetSAN01 (:303-330)
- train forward runs RGB and RGB+D passes with the softmax-weighted MSE
  feature-consistency loss
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from packnet_sfm_tpu.networks.layers.yolov8 import (
    YOLOv8Backbone, DepthNeck)
from packnet_sfm_tpu.networks.layers.resnet import DepthDecoder
from packnet_sfm_tpu.networks.layers.san import (
    MinkowskiEncoder, sparsify_depth, active_row_window, crop_rows,
    paste_rows)

XAVIER = nn.initializers.glorot_uniform()

RESNET_LAYOUT = (64, 64, 128, 256, 512)


class YOLOv8SAN01(nn.Module):
    version: str = ''            # unused; kept for factory uniformity
    variant: str = 's'
    dropout: float = 0.0
    use_film: bool = False
    film_scales: Sequence[int] = (0,)
    use_neck_features: bool = False
    use_depth_neck: bool = False
    use_imagenet_pretrained: bool = False  # gated: needs an external ckpt
    use_dual_head: bool = False
    min_depth: float = 0.5
    max_depth: float = 80.0
    # active-row crop of the SAN branch (see layers/san.py); 0 = off
    san_row_window: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def is_dual_head(self):
        return self.use_dual_head

    def setup(self):
        self.backbone = YOLOv8Backbone(variant=self.variant, dtype=self.dtype)
        if self.use_neck_features or self.use_depth_neck:
            self.neck = DepthNeck(channels=RESNET_LAYOUT, dtype=self.dtype)
        self.adapters = [
            nn.Conv(ch, (1, 1), kernel_init=XAVIER, dtype=self.dtype,
                    name=f'adapter_{i}')
            for i, ch in enumerate(RESNET_LAYOUT)]
        if self.use_dual_head:
            from packnet_sfm_tpu.networks.layers.resnet import \
                DualHeadDepthDecoder
            self.decoder = DualHeadDepthDecoder(
                num_ch_enc=RESNET_LAYOUT, max_depth=self.max_depth,
                dtype=self.dtype)
        else:
            self.decoder = DepthDecoder(num_ch_enc=RESNET_LAYOUT,
                                        dtype=self.dtype)
        if self.use_film:
            rgb_channels = [c if i in tuple(self.film_scales) else 0
                            for i, c in enumerate(RESNET_LAYOUT)]
            self.mconvs = MinkowskiEncoder(channels=RESNET_LAYOUT,
                                           rgb_channels=rgb_channels,
                                           dtype=self.dtype)
        self.weight = self.param('weight', lambda k: jnp.ones((5,)) * 0.5)
        self.bias = self.param('bias', lambda k: jnp.zeros((5,)))

    def run_network(self, rgb, input_depth=None, train=True):
        feats = self.backbone(rgb, train=train)
        if self.use_neck_features or self.use_depth_neck:
            feats = self.neck(feats, train=train)
        skip_features = [ad(f) for ad, f in zip(self.adapters, feats)]
        if input_depth is not None and self.use_film:
            d, mask = sparsify_depth(input_depth)
            H = d.shape[1]
            Hw = (int(H * self.san_row_window) // 32 * 32
                  if self.san_row_window > 0 else 0)
            crop = 0 < Hw < H and H % 32 == 0
            if crop:
                s, dropped = active_row_window(mask, Hw)
                self.sow('intermediates', 'san_dropped', dropped)
                d = crop_rows(d, s, Hw)
                mask = crop_rows(mask, s, Hw)
            fused = []
            for i, feat in enumerate(skip_features):
                denom = (float(feat.shape[1] * feat.shape[2])
                         if crop else None)
                result = self.mconvs(i, d, mask, train, pool_denom=denom)
                if len(result) == 4:
                    sparse_feat, mask, gamma, beta = result
                else:
                    gamma = beta = None
                    sparse_feat, mask = result
                d = sparse_feat
                if crop:
                    sparse_feat = paste_rows(sparse_feat, s // (2 ** (i + 1)),
                                             feat.shape[1])
                w = jax.nn.sigmoid(self.weight[i])
                if gamma is not None:
                    fused.append(w * (gamma * feat + beta)
                                 + (1 - w) * sparse_feat + self.bias[i])
                else:
                    fused.append(w * feat + (1 - w) * sparse_feat
                                 + self.bias[i])
            skip_features = fused
        outputs = self.decoder(skip_features)
        if self.use_dual_head:
            return outputs, skip_features
        scales = range(4) if train else range(1)
        return [outputs[('disp', i)] for i in scales], skip_features

    def __call__(self, rgb, input_depth=None, train=True, **kwargs):
        if not train:
            outputs, _ = self.run_network(rgb, input_depth, train=False)
            if self.use_dual_head:
                return outputs
            return {'inv_depths': outputs}
        out_rgb, skip_rgb = self.run_network(rgb, None, train=True)
        output = dict(out_rgb) if self.use_dual_head \
            else {'inv_depths': out_rgb}
        if input_depth is None:
            return output
        out_rgbd, skip_rgbd = self.run_network(rgb, input_depth, train=True)
        if self.use_dual_head:
            return output
        output['inv_depths_rgbd'] = out_rgbd
        fw = jax.nn.softmax(jnp.abs(self.weight))
        depth_loss = sum(
            fw[i] * jnp.mean(
                (jax.lax.stop_gradient(fr_d.astype(jnp.float32))
                 - fr.astype(jnp.float32)) ** 2)
            for i, (fr_d, fr) in enumerate(zip(skip_rgbd, skip_rgb))
        ) / len(skip_rgbd)
        output['depth_loss'] = depth_loss
        return output
