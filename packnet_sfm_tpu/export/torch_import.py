"""
torchvision -> flax weight import for the ResNet encoder.

The reference initializes its encoders from torchvision ImageNet weights
(reference: networks/layers/resnet/resnet_encoder.py:53-60,86). This module
maps a torchvision-style ResNet state_dict (18/34) onto our flax encoder
param/batch_stats trees (OIHW -> HWIO kernels, BN weight/bias/running stats).

Weights load from: an explicit .pth path, or the torch hub cache if present
(zero-egress environments can pre-seed ~/.cache/torch). Missing weights are
reported and the encoder keeps its init (graceful degradation).

Multi-image first convs (pose nets) replicate conv1 across the stacked input
channels / num_images (reference: resnet_encoder.py:56-58).
"""

import numpy as np


def _k(t):
    """torch OIHW conv weight -> flax HWIO kernel."""
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def torchvision_resnet_to_flax(state_dict, num_layers=18, num_input_images=1):
    """
    Returns (params, batch_stats) subtrees for our ResnetEncoder.

    torchvision layout: conv1/bn1, layer{1..4}.{b}.conv{1,2}/bn{1,2}
    (+ downsample.0/1); our layout: Conv_0/BatchNorm_0 + BasicBlock_{i} with
    Conv_0/1[/2] and BatchNorm_0/1[/2].
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    blocks = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3]}[num_layers]

    params = {}
    stats = {}

    conv1 = sd['conv1.weight']
    if num_input_images > 1:
        conv1 = np.concatenate([conv1] * num_input_images, axis=1) \
            / num_input_images
    params['Conv_0'] = {'kernel': _k(conv1)}
    params['BatchNorm_0'] = {'scale': sd['bn1.weight'],
                             'bias': sd['bn1.bias']}
    stats['BatchNorm_0'] = {'mean': sd['bn1.running_mean'],
                            'var': sd['bn1.running_var']}

    b = 0
    for stage in range(4):
        for blk in range(blocks[stage]):
            pre = 'layer{}.{}.'.format(stage + 1, blk)
            name = 'BasicBlock_{}'.format(b)
            p = {
                'Conv_0': {'kernel': _k(sd[pre + 'conv1.weight'])},
                'BatchNorm_0': {'scale': sd[pre + 'bn1.weight'],
                                'bias': sd[pre + 'bn1.bias']},
                'Conv_1': {'kernel': _k(sd[pre + 'conv2.weight'])},
                'BatchNorm_1': {'scale': sd[pre + 'bn2.weight'],
                                'bias': sd[pre + 'bn2.bias']},
            }
            s = {
                'BatchNorm_0': {'mean': sd[pre + 'bn1.running_mean'],
                                'var': sd[pre + 'bn1.running_var']},
                'BatchNorm_1': {'mean': sd[pre + 'bn2.running_mean'],
                                'var': sd[pre + 'bn2.running_var']},
            }
            if pre + 'downsample.0.weight' in sd:
                p['Conv_2'] = {'kernel': _k(sd[pre + 'downsample.0.weight'])}
                p['BatchNorm_2'] = {'scale': sd[pre + 'downsample.1.weight'],
                                    'bias': sd[pre + 'downsample.1.bias']}
                s['BatchNorm_2'] = {
                    'mean': sd[pre + 'downsample.1.running_mean'],
                    'var': sd[pre + 'downsample.1.running_var']}
            params[name] = p
            stats[name] = s
            b += 1
    return params, stats


def find_torchvision_weights(num_layers):
    """Locate cached torchvision ResNet weights without network access."""
    import glob
    import os
    patterns = [
        os.path.expanduser(
            '~/.cache/torch/hub/checkpoints/resnet{}-*.pth'.format(num_layers)),
        '/root/.cache/torch/hub/checkpoints/resnet{}-*.pth'.format(num_layers),
    ]
    for pat in patterns:
        hits = glob.glob(pat)
        if hits:
            return hits[0]
    return None


def load_pretrained_encoder(variables, num_layers=18, num_input_images=1,
                            weights_path=None, encoder_key='encoder'):
    """
    Merge ImageNet weights into model variables in place of the encoder
    subtree. Returns updated variables; no-op (with a notice) when no weights
    are available.
    """
    import torch

    path = weights_path or find_torchvision_weights(num_layers)
    if path is None:
        print('[pretrained] no torchvision resnet{} weights found; '
              'keeping random init'.format(num_layers))
        return variables
    sd = torch.load(path, map_location='cpu', weights_only=True)
    params, stats = torchvision_resnet_to_flax(sd, num_layers,
                                               num_input_images)
    import jax.numpy as jnp

    def to_jnp(t):
        import jax
        return jax.tree_util.tree_map(jnp.asarray, t)

    new_vars = {k: dict(v) for k, v in variables.items()}
    new_vars['params'] = dict(new_vars['params'])
    new_vars['params'][encoder_key] = to_jnp(params)
    new_vars.setdefault('batch_stats', {})
    new_vars['batch_stats'] = dict(new_vars['batch_stats'])
    new_vars['batch_stats'][encoder_key] = to_jnp(stats)
    print('[pretrained] loaded {} into {}'.format(path, encoder_key))
    return new_vars
