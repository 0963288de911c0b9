"""
RaySurfaceResNet: DepthResNet + learned 3-channel tanh ray-surface decoder
(reference: networks/depth/RaySurfaceResNet.py:34-61,
layers/resnet/raysurface_decoder.py:16-64).
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from packnet_sfm_tpu.networks.layers.resnet import (
    ResnetEncoder, DepthDecoder, ConvBlock, Conv3x3, resnet_num_ch_enc)
from packnet_sfm_tpu.ops.image import upsample2x_nearest
from packnet_sfm_tpu.ops.depth import disp_to_depth


class RaySurfaceDecoder(nn.Module):
    """Same trunk as DepthDecoder with a 3-channel tanh head per scale."""
    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_features):
        num_ch_dec = [16, 32, 64, 128, 256]
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f'upconv_{i}_0')(x)
            x = upsample2x_nearest(x)
            if i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(num_ch_dec[i], self.dtype, name=f'upconv_{i}_1')(x)
            if i in self.scales:
                r = Conv3x3(3, self.dtype, name=f'raysurf_conv_{i}')(x)
                outputs[('raysurf', i)] = jnp.tanh(r.astype(jnp.float32))
        return outputs


class RaySurfaceResNet(nn.Module):
    version: str = '18pt'
    dropout: float = 0.0  # accepted for config parity; unused (reference kwargs)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        num_layers = int(self.version[:2])
        ch = resnet_num_ch_enc(num_layers)
        self.encoder = ResnetEncoder(num_layers=num_layers, dtype=self.dtype)
        self.decoder = DepthDecoder(num_ch_enc=ch, dtype=self.dtype)
        self.ray_surf = RaySurfaceDecoder(num_ch_enc=ch, dtype=self.dtype)

    def __call__(self, rgb, train=True, **kwargs):
        feats = self.encoder(rgb, train=train)
        rays = self.ray_surf(feats)
        disps = self.decoder(feats)
        scales = range(4) if train else range(1)
        inv_depths = [disp_to_depth(disps[('disp', i)], 0.1, 100.0)[0]
                      for i in scales]
        return {'inv_depths': inv_depths, 'ray_surface': rays}
