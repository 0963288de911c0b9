"""
DepthResNet — plain monodepth2 depth net (reference: networks/depth/DepthResNet.py:26-54).

Returns scaled inverse depths via disp_to_depth (0.1-100m), unlike the SAN
nets which return raw sigmoids.
"""


import jax.numpy as jnp
from flax import linen as nn

from packnet_sfm_tpu.networks.layers.resnet import (
    ResnetEncoder, DepthDecoder, resnet_num_ch_enc)
from packnet_sfm_tpu.ops.depth import disp_to_depth


class DepthResNet(nn.Module):
    version: str = '18pt'
    dropout: float = 0.0  # accepted for config parity; unused (reference kwargs)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        num_layers = int(self.version[:2])
        self.encoder = ResnetEncoder(num_layers=num_layers, dtype=self.dtype)
        self.decoder = DepthDecoder(num_ch_enc=resnet_num_ch_enc(num_layers),
                                    dtype=self.dtype)

    def __call__(self, rgb, train=True, **kwargs):
        feats = self.encoder(rgb, train=train)
        outputs = self.decoder(feats)
        scales = range(4) if train else range(1)
        inv_depths = [disp_to_depth(outputs[('disp', i)], 0.1, 100.0)[0]
                      for i in scales]
        return {'inv_depths': inv_depths}
