"""
Pose networks (flax.linen, NHWC).

- PoseNet: SfmLearner-style 7-conv GroupNorm net over concat(target+contexts),
  output 0.01*[B,N,6] (reference: networks/pose/PoseNet.py:38-84)
- PoseResNet: ResNet 2-image encoder + monodepth2 PoseDecoder, output per
  context [translation, axisangle] (reference: networks/pose/PoseResNet.py:25-47)

The 6-vector layout is [tx,ty,tz,rx,ry,rz], matching Pose.from_vec.
"""

import jax.numpy as jnp
from flax import linen as nn

from packnet_sfm_tpu.networks.layers.resnet import (
    ResnetEncoder, PoseDecoder, resnet_num_ch_enc)

XAVIER = nn.initializers.glorot_uniform()


class _ConvGN(nn.Module):
    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(2, 2), padding=(self.kernel_size - 1) // 2,
                    kernel_init=XAVIER, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=16, dtype=jnp.float32)(x)
        return nn.relu(x)


class PoseNet(nn.Module):
    nb_ref_imgs: int = 2
    rotation_mode: str = 'euler'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, context, train=True, **kwargs):
        assert len(context) == self.nb_ref_imgs
        x = jnp.concatenate([image] + list(context), axis=-1)
        for i, (ch, k) in enumerate(zip([16, 32, 64, 128, 256, 256, 256],
                                        [7, 5, 3, 3, 3, 3, 3])):
            x = _ConvGN(ch, k, self.dtype, name=f'conv{i + 1}')(x)
        pose = nn.Conv(6 * self.nb_ref_imgs, (1, 1), kernel_init=XAVIER,
                       name='pose_pred')(x)
        pose = pose.mean(axis=(1, 2))
        return 0.01 * pose.reshape(pose.shape[0], self.nb_ref_imgs, 6)


class PoseResNet(nn.Module):
    version: str = '18pt'
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        num_layers = int(self.version[:2])
        self.encoder = ResnetEncoder(num_layers=num_layers,
                                     num_input_images=2, dtype=self.dtype)
        self.decoder = PoseDecoder(num_ch_enc=resnet_num_ch_enc(num_layers),
                                   num_input_features=1,
                                   num_frames_to_predict_for=2)

    def __call__(self, target_image, ref_imgs, train=True, **kwargs):
        outputs = []
        for ref_img in ref_imgs:
            inputs = jnp.concatenate([target_image, ref_img], axis=-1)
            feats = self.encoder(inputs, train=train)
            axisangle, translation = self.decoder([feats])
            outputs.append(jnp.concatenate(
                [translation[:, 0], axisangle[:, 0]], axis=2))
        return jnp.concatenate(outputs, axis=1)
