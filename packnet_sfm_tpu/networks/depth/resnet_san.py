"""
ResNetSAN01 — the flagship depth-completion network (flax.linen, NHWC).

TPU re-design of reference networks/depth/ResNetSAN01.py:13-355:
- ResNet encoder (18/34/50) feature pyramid
- standard or dual-head (integer+fractional) decoder
- optional SAN sparse-LiDAR branch (masked dense convs, see layers/san.py)
  with depth-aware FiLM (gamma/beta per configured scale) and sigmoid-gated
  learnable per-scale fusion:
      fused = sigmoid(w_i) * (gamma*f + beta) + (1-sigmoid(w_i)) * sparse + b_i
  (reference: ResNetSAN01.py:222-259)
- training forward runs BOTH the RGB-only and RGB+D passes and returns a
  softmax-weighted MSE feature-consistency loss between the two feature
  pyramids (reference: ResNetSAN01.py:321-354)

`use_enhanced_lidar` is accepted and ignored: the reference's
EnhancedMinkowskiEncoder is a half-finished stub whose fallback fabricates
random tensors (enhanced_minkowski_encoder.py:94-115) — see SURVEY.md §2.6.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from packnet_sfm_tpu.networks.layers.resnet import (
    ResnetEncoder, DepthDecoder, DualHeadDepthDecoder, resnet_num_ch_enc)
from packnet_sfm_tpu.networks.layers.san import (
    MinkowskiEncoder, sparsify_depth, active_row_window, crop_rows,
    paste_rows)


def parse_version(version, default_layers=18):
    """'18A' -> (18, 'A'); '50pt' -> (50, 'pt')."""
    if not version:
        return default_layers, 'A'
    num_layers = int(version[:2])
    variant = version[2:] if len(version) > 2 else 'A'
    return num_layers, variant


class ResNetSAN01(nn.Module):
    version: str = '18A'
    dropout: float = 0.0
    use_film: bool = False
    film_scales: Sequence[int] = (0,)
    use_enhanced_lidar: bool = False   # accepted, no-op (see module docstring)
    use_dual_head: bool = False
    min_depth: float = 0.5
    max_depth: float = 80.0
    # Row-structured-LiDAR optimization: > 0 crops every SAN stage to an
    # active-row window of this fraction of the level height (8-aligned),
    # skipping the all-empty above-horizon rows dense convs can't skip.
    # EXACT when the active band (+2-row pool margin) fits the window;
    # otherwise out-of-window points are dropped and counted in the
    # 'san_dropped' output. 0.0 = off (reference-parity default).
    san_row_window: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def is_dual_head(self):
        return self.use_dual_head

    def setup(self):
        num_layers, _ = parse_version(self.version)
        self.encoder = ResnetEncoder(num_layers=num_layers, dtype=self.dtype)
        num_ch_enc = resnet_num_ch_enc(num_layers)
        if self.use_dual_head:
            self.decoder = DualHeadDepthDecoder(
                num_ch_enc=num_ch_enc, max_depth=self.max_depth,
                dtype=self.dtype)
        else:
            self.decoder = DepthDecoder(num_ch_enc=num_ch_enc, dtype=self.dtype)
        if self.use_film:
            rgb_channels = [c if i in tuple(self.film_scales) else 0
                            for i, c in enumerate(num_ch_enc)]
            self.mconvs = MinkowskiEncoder(channels=num_ch_enc,
                                           rgb_channels=rgb_channels,
                                           dtype=self.dtype)
        # Learnable per-scale fusion gates (reference: ResNetSAN01.py:129-135)
        self.weight = self.param('weight', lambda k: jnp.ones((5,)) * 0.5)
        self.bias = self.param('bias', lambda k: jnp.zeros((5,)))

    def run_network(self, rgb, input_depth=None, train=True):
        skip_features = self.encoder(rgb, train=train)
        if input_depth is not None and self.use_film:
            d, mask = sparsify_depth(input_depth)
            # Row-structured-LiDAR crop: run the whole SAN stack on a
            # fixed-size active-row window (traced start, static height),
            # pasting each stage's output back for the skip fusion. See
            # layers/san.py active_row_window for the exactness argument.
            H = d.shape[1]
            Hw = (int(H * self.san_row_window) // 32 * 32
                  if self.san_row_window > 0 else 0)
            crop = 0 < Hw < H and H % 32 == 0
            if crop:
                s, dropped = active_row_window(mask, Hw)
                # visible when applied with mutable=['intermediates']
                self.sow('intermediates', 'san_dropped', dropped)
                d = crop_rows(d, s, Hw)
                mask = crop_rows(mask, s, Hw)
            fused = []
            for i, feat in enumerate(skip_features):
                lvl_h = feat.shape[1]
                denom = (float(lvl_h * feat.shape[2])
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
                                             lvl_h)
                w = jax.nn.sigmoid(self.weight[i])
                if gamma is not None:
                    modulated = gamma * feat + beta
                    fused_feat = (w * modulated + (1 - w) * sparse_feat
                                  + self.bias[i])
                else:
                    fused_feat = (w * feat + (1 - w) * sparse_feat
                                  + self.bias[i])
                fused.append(fused_feat)
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
        if self.use_dual_head:
            output = dict(out_rgb)
        else:
            output = {'inv_depths': out_rgb}
        if input_depth is None:
            return output

        out_rgbd, skip_rgbd = self.run_network(rgb, input_depth, train=True)
        if self.use_dual_head:
            # dual-head handles RGB/RGB+D mixing at the loss level (reference)
            return output
        output['inv_depths_rgbd'] = out_rgbd
        # Feature-consistency loss weighted by softmax(|w|) (reference :342-352)
        fw = jax.nn.softmax(jnp.abs(self.weight))
        depth_loss = sum(
            fw[i] * jnp.mean(
                (jax.lax.stop_gradient(fr_d.astype(jnp.float32))
                 - fr.astype(jnp.float32)) ** 2)
            for i, (fr_d, fr) in enumerate(zip(skip_rgbd, skip_rgb))
        ) / len(skip_rgbd)
        output['depth_loss'] = depth_loss
        return output
