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
    """Locate cached torchvision ResNet weights without network access.

    Search order: $PACKNET_WEIGHTS_DIR, then the torch hub cache (zero-egress
    environments pre-seed either)."""
    import glob
    import os
    patterns = []
    env_dir = os.environ.get('PACKNET_WEIGHTS_DIR', '')
    if env_dir:
        patterns.append(os.path.join(
            env_dir, 'resnet{}*.pth'.format(num_layers)))
    patterns += [
        os.path.expanduser(
            '~/.cache/torch/hub/checkpoints/resnet{}-*.pth'.format(num_layers)),
        '/root/.cache/torch/hub/checkpoints/resnet{}-*.pth'.format(num_layers),
    ]
    for pat in patterns:
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    return None


class PretrainedWeightsNotFound(FileNotFoundError):
    """Raised when a 'pt' config demands ImageNet/COCO weights that are not
    present (reference behaviour: torchvision downloads them; zero-egress
    TPU hosts must pre-seed $PACKNET_WEIGHTS_DIR or pass an explicit path).
    Set model.depth_net.allow_random_init: true to opt out explicitly."""


def load_pretrained_encoder(variables, num_layers=18, num_input_images=1,
                            weights_path=None, encoder_key='encoder',
                            required=False):
    """
    Merge ImageNet weights into model variables in place of the encoder
    subtree. Returns updated variables. With required=True a missing weight
    file raises PretrainedWeightsNotFound; otherwise it is a printed no-op.
    """
    import torch

    path = weights_path or find_torchvision_weights(num_layers)
    if path is None:
        msg = ('no torchvision resnet{} ImageNet weights found (searched '
               '$PACKNET_WEIGHTS_DIR and the torch hub cache)'
               .format(num_layers))
        if required:
            raise PretrainedWeightsNotFound(msg)
        print('[pretrained] {}; keeping random init'.format(msg))
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


########################################################################################################################
# YOLOv8 (ultralytics .pt) -> flax CSPDarknet backbone
# (reference loads COCO/ImageNet YOLOv8 weights: YOLOv8SAN01.py:219-238)

def _strip_model_prefix(sd):
    """Normalize ultralytics state_dict keys to '<idx>.<...>' form."""
    out = {}
    for k, v in sd.items():
        while k.startswith('model.'):
            k = k[len('model.'):]
        out[k] = v
    return out


def _conv_bn_from(sd, prefix):
    """One ultralytics Conv (conv+bn) -> our ConvBnSiLU subtrees."""
    p = {'Conv_0': {'kernel': _k(sd[prefix + 'conv.weight'])},
         'BatchNorm_0': {'scale': np.asarray(sd[prefix + 'bn.weight']),
                         'bias': np.asarray(sd[prefix + 'bn.bias'])}}
    s = {'BatchNorm_0': {'mean': np.asarray(sd[prefix + 'bn.running_mean']),
                         'var': np.asarray(sd[prefix + 'bn.running_var'])}}
    return p, s


def _c2f_from(sd, prefix, n):
    """ultralytics C2f (cv1, m.0..n-1, cv2) -> our C2f subtree
    (ConvBnSiLU_0=cv1, Bottleneck_i, ConvBnSiLU_1=cv2)."""
    params, stats = {}, {}
    params['ConvBnSiLU_0'], stats['ConvBnSiLU_0'] = \
        _conv_bn_from(sd, prefix + 'cv1.')
    for i in range(n):
        bp, bs = {}, {}
        bp['ConvBnSiLU_0'], bs['ConvBnSiLU_0'] = \
            _conv_bn_from(sd, '{}m.{}.cv1.'.format(prefix, i))
        bp['ConvBnSiLU_1'], bs['ConvBnSiLU_1'] = \
            _conv_bn_from(sd, '{}m.{}.cv2.'.format(prefix, i))
        params['Bottleneck_{}'.format(i)] = bp
        stats['Bottleneck_{}'.format(i)] = bs
    params['ConvBnSiLU_1'], stats['ConvBnSiLU_1'] = \
        _conv_bn_from(sd, prefix + 'cv2.')
    return params, stats


def yolov8_backbone_to_flax(state_dict, variant='s'):
    """
    Map an ultralytics YOLOv8 backbone state_dict (detection or -cls
    checkpoint; layers model.0..model.9) onto our flax YOLOv8Backbone tree
    (networks/layers/yolov8.py:103-131). Returns (params, batch_stats).
    """
    from packnet_sfm_tpu.networks.layers.yolov8 import YOLOV8_VARIANTS
    d, _, _ = YOLOV8_VARIANTS[variant]
    reps = [max(1, round(r * d)) for r in (3, 6, 6, 3)]
    sd = _strip_model_prefix({k: np.asarray(v)
                              for k, v in state_dict.items()})

    params, stats = {}, {}
    conv_idx = [(0, 'ConvBnSiLU_0'), (1, 'ConvBnSiLU_1'),
                (3, 'ConvBnSiLU_2'), (5, 'ConvBnSiLU_3'),
                (7, 'ConvBnSiLU_4')]
    for li, name in conv_idx:
        params[name], stats[name] = _conv_bn_from(sd, '{}.'.format(li))
    c2f_idx = [(2, 'C2f_0', reps[0]), (4, 'C2f_1', reps[1]),
               (6, 'C2f_2', reps[2]), (8, 'C2f_3', reps[3])]
    for li, name, n in c2f_idx:
        params[name], stats[name] = _c2f_from(sd, '{}.'.format(li), n)
    sp, ss = {}, {}
    sp['ConvBnSiLU_0'], ss['ConvBnSiLU_0'] = _conv_bn_from(sd, '9.cv1.')
    sp['ConvBnSiLU_1'], ss['ConvBnSiLU_1'] = _conv_bn_from(sd, '9.cv2.')
    params['SPPF_0'], stats['SPPF_0'] = sp, ss
    return params, stats


def find_yolov8_weights(variant):
    """Locate a yolov8<variant> state_dict .pt without network access."""
    import glob
    import os
    patterns = []
    env_dir = os.environ.get('PACKNET_WEIGHTS_DIR', '')
    if env_dir:
        patterns.append(os.path.join(env_dir,
                                     'yolov8{}*.pt'.format(variant)))
    patterns.append(os.path.expanduser(
        '~/.cache/torch/hub/checkpoints/yolov8{}*.pt'.format(variant)))
    for pat in patterns:
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    return None


def load_pretrained_yolov8(variables, variant='s', weights_path=None,
                           backbone_key='backbone', required=False):
    """
    Merge YOLOv8 COCO/ImageNet backbone weights into YOLOv8SAN01 variables.
    Accepts a torch state_dict .pt (torch.save(model.state_dict())); full
    ultralytics checkpoints (pickled Model objects) cannot be unpickled
    without the ultralytics package — re-save them as a state_dict first.
    """
    import torch

    path = weights_path or find_yolov8_weights(variant)
    if path is None:
        msg = ('no yolov8{} weights found (searched $PACKNET_WEIGHTS_DIR '
               'and the torch hub cache)'.format(variant))
        if required:
            raise PretrainedWeightsNotFound(msg)
        print('[pretrained] {}; keeping random init'.format(msg))
        return variables
    try:
        sd = torch.load(path, map_location='cpu', weights_only=True)
    except Exception as e:
        raise PretrainedWeightsNotFound(
            '{} is not a plain state_dict (a full ultralytics checkpoint?); '
            're-save it with torch.save(ckpt["model"].state_dict(), ...) '
            'first ({})'.format(path, e))
    if not any(hasattr(v, 'shape') for v in sd.values()):
        raise PretrainedWeightsNotFound(
            '{} does not look like a state_dict'.format(path))
    params, stats = yolov8_backbone_to_flax(sd, variant)

    import jax
    import jax.numpy as jnp

    def to_jnp(t):
        return jax.tree_util.tree_map(jnp.asarray, t)

    new_vars = {k: dict(v) for k, v in variables.items()}
    new_vars['params'] = dict(new_vars['params'])
    new_vars['params'][backbone_key] = to_jnp(params)
    new_vars.setdefault('batch_stats', {})
    new_vars['batch_stats'] = dict(new_vars['batch_stats'])
    new_vars['batch_stats'][backbone_key] = to_jnp(stats)
    print('[pretrained] loaded {} into {}'.format(path, backbone_key))
    return new_vars
