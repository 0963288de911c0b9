"""
torchvision -> flax weight import for the ResNet encoder.

The reference initializes its encoders from torchvision ImageNet weights
(reference: networks/layers/resnet/resnet_encoder.py:53-60,86). This module
maps a torchvision-style ResNet state_dict (18/34 BasicBlock, 50/101/152
Bottleneck) onto our flax encoder
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


# torchvision stage layouts (reference builds 18/34/50 encoders from these:
# /root/reference/packnet_sfm/networks/layers/resnet/resnet_encoder.py:61-98)
_TV_BLOCKS = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3],
              101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}


def _is_bottleneck(num_layers):
    return num_layers > 34


def torchvision_resnet_to_flax(state_dict, num_layers=18, num_input_images=1):
    """
    Returns (params, batch_stats) subtrees for our ResnetEncoder.

    torchvision layout: conv1/bn1, layer{1..4}.{b}.conv{1,2[,3]}/bn{1,2[,3]}
    (+ downsample.0/1); our layout: Conv_0/BatchNorm_0 + BasicBlock_{i}
    (convs: main 3x3 x2, then optional downsample) or Bottleneck_{i}
    (convs: 1x1 / 3x3 / 1x1, then optional downsample) with flax
    auto-numbered Conv_j/BatchNorm_j in call order.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    blocks = _TV_BLOCKS[num_layers]
    n_main = 3 if _is_bottleneck(num_layers) else 2
    blk_cls = 'Bottleneck' if _is_bottleneck(num_layers) else 'BasicBlock'

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
            name = '{}_{}'.format(blk_cls, b)
            p, s = {}, {}
            for j in range(n_main):
                p['Conv_{}'.format(j)] = {
                    'kernel': _k(sd[pre + 'conv{}.weight'.format(j + 1)])}
                p['BatchNorm_{}'.format(j)] = {
                    'scale': sd[pre + 'bn{}.weight'.format(j + 1)],
                    'bias': sd[pre + 'bn{}.bias'.format(j + 1)]}
                s['BatchNorm_{}'.format(j)] = {
                    'mean': sd[pre + 'bn{}.running_mean'.format(j + 1)],
                    'var': sd[pre + 'bn{}.running_var'.format(j + 1)]}
            if pre + 'downsample.0.weight' in sd:
                p['Conv_{}'.format(n_main)] = {
                    'kernel': _k(sd[pre + 'downsample.0.weight'])}
                p['BatchNorm_{}'.format(n_main)] = {
                    'scale': sd[pre + 'downsample.1.weight'],
                    'bias': sd[pre + 'downsample.1.bias']}
                s['BatchNorm_{}'.format(n_main)] = {
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


########################################################################################################################
# FULL reference-checkpoint interop: ResNetSAN01 (encoder+decoder+SAN+FiLM)
#
# Maps a reference-format torch state_dict — the naming produced by
# /root/reference/packnet_sfm/networks/depth/ResNetSAN01.py:61-131 with the
# prefix handling of utils/load.py:114-163 — onto our flax ResNetSAN01
# variables, and back. This is the checkpoint-level parity surface: a
# reference-trained .ckpt ingested here must produce identical eval metrics
# (tests/test_reference_ckpt.py pins the round-trip; the RGB path is also
# cross-checked against the torch mirror).
#
# MinkowskiEngine kernels are stored [k*k, cin, cout] with the FIRST sparse
# coordinate axis (row) varying fastest in the kernel-offset enumeration
# (ME KernelGenerator hypercube order); `me_kernel_order` lets a genuine
# TRI checkpoint flip that assumption if it disagrees.

_MCONV_SEQS = {          # reference layer name -> (our module, conv slots)
    'layer1': ('_MaskedConvSeq_0', [('0', 'Conv_0')], []),
    'layer2': ('_MaskedConvSeq_1', [('0', 'Conv_0'), ('3', 'Conv_1')],
               [('1', 'MaskedBatchNorm_0')]),
    'layer3': ('_MaskedConvSeq_2',
               [('0', 'Conv_0'), ('3', 'Conv_1'), ('6', 'Conv_2')],
               [('1', 'MaskedBatchNorm_0'), ('4', 'MaskedBatchNorm_1')]),
}


def _me_kernel_to_hwio(kernel, me_kernel_order='first_axis_fastest'):
    k2, cin, cout = kernel.shape
    k = int(round(k2 ** 0.5))
    arr = np.asarray(kernel).reshape(k, k, cin, cout)
    if me_kernel_order == 'first_axis_fastest':
        arr = np.transpose(arr, (1, 0, 2, 3))   # [x,y,...] -> [y,x,...]
    return arr


def _hwio_to_me_kernel(kernel, me_kernel_order='first_axis_fastest'):
    kh, kw, cin, cout = kernel.shape
    arr = np.asarray(kernel)
    if me_kernel_order == 'first_axis_fastest':
        arr = np.transpose(arr, (1, 0, 2, 3))
    return arr.reshape(kh * kw, cin, cout)


def _bn_from_ref(sd, prefix):
    p = {'scale': np.asarray(sd[prefix + 'weight']),
         'bias': np.asarray(sd[prefix + 'bias'])}
    s = {'mean': np.asarray(sd[prefix + 'running_mean']),
         'var': np.asarray(sd[prefix + 'running_var'])}
    return p, s


def _decoder_modlist_names(scales=(0, 1, 2, 3), dual_head=False):
    """reference ModuleList index -> our decoder module name
    (depth_decoder.py:29-46 insert order; dual-head:
    dual_head_depth_decoder.py:71-95 — upconvs then interleaved
    integer_conv/fractional_conv per scale)."""
    names = []
    for i in range(4, -1, -1):
        names.append(('upconv_{}_0'.format(i), True))
        names.append(('upconv_{}_1'.format(i), True))
    for s in scales:
        if dual_head:
            names.append(('integer_conv_{}'.format(s), False))
            names.append(('fractional_conv_{}'.format(s), False))
        else:
            names.append(('dispconv_{}'.format(s), False))
    return names


def _mconvs_from_reference(sd, me_kernel_order='first_axis_fastest'):
    """reference `mconvs.*` entries (MinkowskiEncoder: minkowski_encoder.py
    :100-140 naming) -> (params, batch_stats) for our flax MinkowskiEncoder.
    Shared by the ResNetSAN01 and PackNet-SAN importers."""
    mc_p, mc_s = {}, {}
    n_stages = len({k.split('.')[2] for k in sd
                    if k.startswith('mconvs.mconvs.')})
    for st in range(n_stages):
        base = 'mconvs.mconvs.{}.'.format(st)
        p, s = {}, {}
        for lname, (ours, convs, bns) in _MCONV_SEQS.items():
            sp, ss = {}, {}
            for slot, conv_name in convs:
                kern = _me_kernel_to_hwio(
                    sd[base + '{}.{}.kernel'.format(lname, slot)],
                    me_kernel_order)
                # ME convs are bias-free; our nn.Conv carries a zero bias
                sp[conv_name] = {'kernel': kern,
                                 'bias': np.zeros(kern.shape[-1], np.float32)}
            for slot, bn_name in bns:
                bp, bs = _bn_from_ref(
                    sd, base + '{}.{}.bn.'.format(lname, slot))
                sp[bn_name] = bp
                ss[bn_name] = bs
            p[ours] = sp
            if ss:
                s[ours] = ss
        fp, fs = _bn_from_ref(sd, base + 'layer_final.0.bn.')
        p['MaskedBatchNorm_0'] = fp
        s['MaskedBatchNorm_0'] = fs
        mc_p['mconv_{}'.format(st)] = p
        mc_s['mconv_{}'.format(st)] = s
    for k in sd:
        if k.startswith('mconvs.film_generators.'):
            scale = k.split('.')[2]
            if k.endswith('.1.weight'):
                mc_p.setdefault('film_{}'.format(scale), {})['kernel'] = \
                    _k(sd[k])
            elif k.endswith('.1.bias'):
                mc_p.setdefault('film_{}'.format(scale), {})['bias'] = \
                    np.asarray(sd[k])
    return mc_p, mc_s


def _mconvs_to_reference(mp, ms, sd, me_kernel_order='first_axis_fastest'):
    """Inverse of _mconvs_from_reference: write reference-named `mconvs.*`
    entries into sd (in place)."""
    def put_bn(pre, bp, bs):
        _put_ref_bn(sd, pre, bp, bs)

    stages = sorted(int(k.split('_')[1]) for k in mp
                    if k.startswith('mconv_'))
    for st in stages:
        base = 'mconvs.mconvs.{}.'.format(st)
        mod = mp['mconv_{}'.format(st)]
        mods = ms['mconv_{}'.format(st)]
        for lname, (ours, convs, bns) in _MCONV_SEQS.items():
            for slot, conv_name in convs:
                sd[base + '{}.{}.kernel'.format(lname, slot)] = \
                    _hwio_to_me_kernel(mod[ours][conv_name]['kernel'],
                                       me_kernel_order)
            for slot, bn_name in bns:
                put_bn(base + '{}.{}.bn.'.format(lname, slot),
                       mod[ours][bn_name], mods[ours][bn_name])
        put_bn(base + 'layer_final.0.bn.', mod['MaskedBatchNorm_0'],
               mods['MaskedBatchNorm_0'])
    for k in mp:
        if k.startswith('film_'):
            scale = k.split('_')[1]
            pre = 'mconvs.film_generators.{}.1.'.format(scale)
            sd[pre + 'weight'] = _k_inv(mp[k]['kernel'])
            sd[pre + 'bias'] = mp[k]['bias']


def reference_depth_net_to_flax(sd, num_layers=18,
                                me_kernel_order='first_axis_fastest'):
    """reference ResNetSAN01 state_dict (keys relative to depth_net) ->
    (params, batch_stats) trees for our flax ResNetSAN01."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc_sd = {k[len('encoder.encoder.'):]: v for k, v in sd.items()
              if k.startswith('encoder.encoder.')}
    enc_p, enc_s = torchvision_resnet_to_flax(enc_sd, num_layers)

    # 14 decoder entries = standard DepthDecoder (10 upconv + 4 dispconv),
    # 18 = dual-head (10 upconv + 4x interleaved integer/fractional convs)
    n_dec = len({k.split('.')[2] for k in sd
                 if k.startswith('decoder.decoder.')})
    dec_p = {}
    for n, (name, is_block) in enumerate(
            _decoder_modlist_names(dual_head=(n_dec == 18))):
        pre = 'decoder.decoder.{}.conv.'.format(n)
        pre = pre + 'conv.' if is_block else pre
        dec_p[name] = {'Conv_0': {'kernel': _k(sd[pre + 'weight']),
                                  'bias': np.asarray(sd[pre + 'bias'])}}

    mc_p, mc_s = _mconvs_from_reference(sd, me_kernel_order)

    params = {'encoder': enc_p, 'decoder': dec_p}
    stats = {'encoder': enc_s}
    if mc_p:
        params['mconvs'] = mc_p
        stats['mconvs'] = mc_s
    if 'weight' in sd:
        params['weight'] = np.asarray(sd['weight'])
        params['bias'] = np.asarray(sd['bias'])
    return params, stats


def _put_ref_bn(sd, pre, bp, bs):
    """Write one BatchNorm in reference/torchvision naming (incl. the
    num_batches_tracked buffer torch's strict load_state_dict demands)."""
    sd[pre + 'weight'] = bp['scale']
    sd[pre + 'bias'] = bp['bias']
    sd[pre + 'running_mean'] = bs['mean']
    sd[pre + 'running_var'] = bs['var']
    sd[pre + 'num_batches_tracked'] = np.zeros((), np.int64)


def _export_tv_encoder(sd, prefix, ep, es, num_layers):
    """Our flax ResnetEncoder trees -> torchvision naming under `prefix`
    (shared by the depth-net and pose-net exporters). Handles both
    BasicBlock (18/34) and Bottleneck (50/101/152) layouts."""
    blocks = _TV_BLOCKS[num_layers]
    n_main = 3 if _is_bottleneck(num_layers) else 2
    blk_cls = 'Bottleneck' if _is_bottleneck(num_layers) else 'BasicBlock'
    sd[prefix + 'conv1.weight'] = _k_inv(ep['Conv_0']['kernel'])
    _put_ref_bn(sd, prefix + 'bn1.', ep['BatchNorm_0'], es['BatchNorm_0'])
    b = 0
    for stage in range(4):
        for blk in range(blocks[stage]):
            pre = '{}layer{}.{}.'.format(prefix, stage + 1, blk)
            name = '{}_{}'.format(blk_cls, b)
            for j in range(n_main):
                sd[pre + 'conv{}.weight'.format(j + 1)] = \
                    _k_inv(ep[name]['Conv_{}'.format(j)]['kernel'])
                _put_ref_bn(sd, pre + 'bn{}.'.format(j + 1),
                            ep[name]['BatchNorm_{}'.format(j)],
                            es[name]['BatchNorm_{}'.format(j)])
            if 'Conv_{}'.format(n_main) in ep[name]:
                sd[pre + 'downsample.0.weight'] = \
                    _k_inv(ep[name]['Conv_{}'.format(n_main)]['kernel'])
                _put_ref_bn(sd, pre + 'downsample.1.',
                            ep[name]['BatchNorm_{}'.format(n_main)],
                            es[name]['BatchNorm_{}'.format(n_main)])
            b += 1


def _infer_tv_num_layers(enc_sd):
    """Infer 18/34/50/101/152 from a torchvision-style encoder state_dict."""
    bottleneck = any(k.startswith('layer1.0.conv3.') for k in enc_sd)
    n3 = 1 + max((int(k.split('.')[1]) for k in enc_sd
                  if k.startswith('layer3.')), default=0)
    if bottleneck:
        return {36: 152, 23: 101}.get(n3, 50)
    return 34 if any(k.startswith('layer1.2.') for k in enc_sd) else 18


def _infer_flax_num_layers(ep):
    """Infer 18/34/50/101/152 from our flax encoder params subtree."""
    if 'Bottleneck_0' in ep:
        n = sum(1 for k in ep if k.startswith('Bottleneck_'))
        return {16: 50, 33: 101, 50: 152}[n]
    return 34 if 'BasicBlock_8' in ep else 18


def flax_to_reference_depth_net(variables, num_layers=18,
                                me_kernel_order='first_axis_fastest'):
    """Inverse of reference_depth_net_to_flax: our flax ResNetSAN01
    variables -> a reference-format (numpy) state_dict."""
    p = jax_to_np(variables['params'])
    s = jax_to_np(variables.get('batch_stats', {}))
    sd = {}
    _export_tv_encoder(sd, 'encoder.encoder.', p['encoder'], s['encoder'],
                       num_layers)

    dual = 'integer_conv_0' in p['decoder']
    for n, (name, is_block) in enumerate(
            _decoder_modlist_names(dual_head=dual)):
        pre = 'decoder.decoder.{}.conv.'.format(n)
        pre = pre + 'conv.' if is_block else pre
        sd[pre + 'weight'] = _k_inv(p['decoder'][name]['Conv_0']['kernel'])
        sd[pre + 'bias'] = p['decoder'][name]['Conv_0']['bias']

    if 'mconvs' in p:
        _mconvs_to_reference(p['mconvs'], s['mconvs'], sd, me_kernel_order)
    if 'weight' in p:
        sd['weight'] = np.asarray(p['weight'])
        sd['bias'] = np.asarray(p['bias'])
    return sd


def _k_inv(kernel):
    """flax HWIO kernel -> torch OIHW weight."""
    return np.transpose(np.asarray(kernel), (3, 2, 0, 1))


def jax_to_np(tree):
    import jax
    return jax.tree_util.tree_map(np.asarray, tree)


def strip_reference_prefix(state_dict, key='depth_net'):
    """Extract `<...>.{key}.<rest>` entries as {rest: value} — the same
    prefix-anywhere matching as reference utils/load.py:146-156."""
    out = {}
    needle = key + '.'
    for k, v in state_dict.items():
        idx = k.find(needle)
        if idx >= 0:
            out[k[idx + len(needle):]] = v
    return out


def load_reference_checkpoint(variables, path_or_sd, num_layers=18,
                              key='depth_net',
                              me_kernel_order='first_axis_fastest'):
    """Merge a FULL reference checkpoint (torch .ckpt with 'state_dict', or
    a raw state_dict) into our flax ResNetSAN01 variables.

    Unlike the tolerant reference loader this is fail-loud: the mapped tree
    must structurally match (missing SAN/FiLM subtrees are allowed only if
    the checkpoint genuinely has none)."""
    if isinstance(path_or_sd, (str, bytes)):
        import torch
        ckpt = torch.load(path_or_sd, map_location='cpu', weights_only=False)
        sd = ckpt.get('state_dict', ckpt)
    else:
        sd = path_or_sd
    sd = {k: np.asarray(v) for k, v in sd.items()}
    rel = strip_reference_prefix(sd, key) if any(
        (key + '.') in k for k in sd) else sd
    params, stats = reference_depth_net_to_flax(
        rel, num_layers, me_kernel_order)
    import jax
    import jax.numpy as jnp

    def to_jnp(t):
        return jax.tree_util.tree_map(jnp.asarray, t)

    new_vars = {k: dict(v) for k, v in variables.items()}
    merged_p = dict(new_vars['params'])
    merged_p.update(to_jnp(params))
    new_vars['params'] = merged_p
    merged_s = dict(new_vars.get('batch_stats', {}))
    merged_s.update(to_jnp(stats))
    new_vars['batch_stats'] = merged_s
    return new_vars


########################################################################################################################
# FULL reference-checkpoint interop: PackNet family
#
# Maps reference-format PackNet01 / PackNetSlim01 (flat names,
# /root/reference/packnet_sfm/networks/depth/PackNet01.py:25-104),
# PackNetSAN01 (encoder./decoder. nesting + mconvs + gates,
# PackNetSAN01.py:143-183) and PackNetSlimSAN01 (flat names + FiLM mconvs,
# PackNetSlimSAN01.py:16-113) state_dicts onto our flax PackNet variables and
# back. The published TRI PackNet01 KITTI checkpoints transport through this
# path. Layer naming from layers01.py: Conv2D {conv_base, normalize} (:25-36),
# ResidualConv {conv1, conv2, conv3[.0 under dropout], normalize} (:40-72),
# InvDepth {conv1} (:98-117), Pack/UnpackLayerConv3d {conv3d, conv.<Conv2D>}
# (:213-285). The conv3d weight lands in whichever _Conv3DStack layout the
# target variables use (literal / depthwin2d / depthwise).

_PN_ENCODER_MODS = ('pre_calc', 'conv1', 'conv2', 'conv3', 'conv4', 'conv5',
                    'pack1', 'pack2', 'pack3', 'pack4', 'pack5')
_PN_DECODER_MODS = ('unpack1', 'unpack2', 'unpack3', 'unpack4', 'unpack5',
                    'iconv1', 'iconv2', 'iconv3', 'iconv4', 'iconv5',
                    'disp1_layer', 'disp2_layer', 'disp3_layer', 'disp4_layer')


def _pn_flatten_names(sd):
    """Strip the PackNetSAN01 encoder./decoder. nesting; module names are
    unique across the two, so the flat namespace is unambiguous."""
    out = {}
    for k, v in sd.items():
        if k.startswith('encoder.') and not k.startswith('encoder.encoder.'):
            k = k[len('encoder.'):]
        elif k.startswith('decoder.'):
            k = k[len('decoder.'):]
        out[k] = v
    return out


def _pn_conv2d_from(sd, pre):
    return {'Conv_0': {'kernel': _k(sd[pre + 'conv_base.weight']),
                       'bias': np.asarray(sd[pre + 'conv_base.bias'])},
            'GroupNorm_0': {'scale': np.asarray(sd[pre + 'normalize.weight']),
                            'bias': np.asarray(sd[pre + 'normalize.bias'])}}


def _pn_conv2d_to(sd, pre, p):
    sd[pre + 'conv_base.weight'] = _k_inv(p['Conv_0']['kernel'])
    sd[pre + 'conv_base.bias'] = np.asarray(p['Conv_0']['bias'])
    sd[pre + 'normalize.weight'] = np.asarray(p['GroupNorm_0']['scale'])
    sd[pre + 'normalize.bias'] = np.asarray(p['GroupNorm_0']['bias'])


def _pn_residual_from(sd, pre):
    # under dropout the reference wraps conv3 in a Sequential -> conv3.0.*
    c3 = pre + ('conv3.0.' if pre + 'conv3.0.weight' in sd else 'conv3.')
    return {'Conv2D_0': _pn_conv2d_from(sd, pre + 'conv1.'),
            'Conv2D_1': _pn_conv2d_from(sd, pre + 'conv2.'),
            'Conv_0': {'kernel': _k(sd[c3 + 'weight']),
                       'bias': np.asarray(sd[c3 + 'bias'])},
            'GroupNorm_0': {'scale': np.asarray(sd[pre + 'normalize.weight']),
                            'bias': np.asarray(sd[pre + 'normalize.bias'])}}


def _pn_residual_to(sd, pre, p):
    _pn_conv2d_to(sd, pre + 'conv1.', p['Conv2D_0'])
    _pn_conv2d_to(sd, pre + 'conv2.', p['Conv2D_1'])
    sd[pre + 'conv3.weight'] = _k_inv(p['Conv_0']['kernel'])
    sd[pre + 'conv3.bias'] = np.asarray(p['Conv_0']['bias'])
    sd[pre + 'normalize.weight'] = np.asarray(p['GroupNorm_0']['scale'])
    sd[pre + 'normalize.bias'] = np.asarray(p['GroupNorm_0']['bias'])


def _pn_conv3d_from(sd, pre, stack_tpl):
    """torch conv3d weight [j,1,dz,kh,kw] -> the _Conv3DStack layout present
    in stack_tpl (see export/torch_mirror.py _load_pn_conv3d for the exact
    inverse maps)."""
    w = np.asarray(sd[pre + 'conv3d.weight'])
    b = np.asarray(sd[pre + 'conv3d.bias'])
    if 'win2d' in stack_tpl:
        return {'win2d': {'kernel': np.ascontiguousarray(
                              w[:, 0].transpose(2, 3, 1, 0)),
                          'bias': b}}
    if 'win2d_kernel' in stack_tpl:
        return {'win2d_kernel': np.ascontiguousarray(
                    w[:, 0].transpose(2, 3, 1, 0)),
                'win2d_bias': b}
    return {'Conv_0': {'kernel': np.ascontiguousarray(
                           w.transpose(2, 3, 4, 1, 0)),
                       'bias': b}}


def _pn_conv3d_to(sd, pre, stack):
    if 'win2d' in stack:
        k, b = stack['win2d']['kernel'], stack['win2d']['bias']
        w = np.asarray(k).transpose(3, 2, 0, 1)[:, None]
    elif 'win2d_kernel' in stack:
        k, b = stack['win2d_kernel'], stack['win2d_bias']
        w = np.asarray(k).transpose(3, 2, 0, 1)[:, None]
    else:
        k, b = stack['Conv_0']['kernel'], stack['Conv_0']['bias']
        w = np.asarray(k).transpose(4, 3, 0, 1, 2)
    sd[pre + 'conv3d.weight'] = np.ascontiguousarray(w)
    sd[pre + 'conv3d.bias'] = np.asarray(b)


def reference_packnet_to_flax(sd, variables,
                              me_kernel_order='first_axis_fastest'):
    """reference PackNet-family state_dict (keys relative to depth_net) ->
    (params, batch_stats) trees shaped like `variables` (which supplies the
    residual-block counts and the conv3d weight layout)."""
    sd = _pn_flatten_names({k: np.asarray(v) for k, v in sd.items()})
    tpl = jax_to_np(variables['params'])['core']
    core = {'pre_calc': _pn_conv2d_from(sd, 'pre_calc.'),
            'conv1': _pn_conv2d_from(sd, 'conv1.')}
    for name in ('conv2', 'conv3', 'conv4', 'conv5'):
        blk = {}
        for sub in tpl[name]:
            i = int(sub.split('_')[1])
            blk[sub] = _pn_residual_from(sd, '{}.{}.'.format(name, i))
        core[name] = blk
    for name in ('pack1', 'pack2', 'pack3', 'pack4', 'pack5',
                 'unpack1', 'unpack2', 'unpack3', 'unpack4', 'unpack5'):
        core[name] = {
            '_Conv3DStack_0': _pn_conv3d_from(
                sd, name + '.', tpl[name]['_Conv3DStack_0']),
            'Conv2D_0': _pn_conv2d_from(sd, name + '.conv.')}
    for name in ('iconv1', 'iconv2', 'iconv3', 'iconv4', 'iconv5'):
        core[name] = _pn_conv2d_from(sd, name + '.')
    for name in ('disp1_layer', 'disp2_layer', 'disp3_layer', 'disp4_layer'):
        core[name] = {'Conv_0': {'kernel': _k(sd[name + '.conv1.weight']),
                                 'bias': np.asarray(
                                     sd[name + '.conv1.bias'])}}
    params, stats = {'core': core}, {}
    if any(k.startswith('mconvs.') for k in sd):
        mc_p, mc_s = _mconvs_from_reference(sd, me_kernel_order)
        params['mconvs'] = mc_p
        stats['mconvs'] = mc_s
        params['weight'] = np.asarray(sd['weight'])
        params['bias'] = np.asarray(sd['bias'])
    return params, stats


def flax_to_reference_packnet(variables, nested=False,
                              me_kernel_order='first_axis_fastest'):
    """Inverse of reference_packnet_to_flax: our flax PackNet-family
    variables -> a reference-format (numpy) state_dict. nested=True emits
    the PackNetSAN01 encoder./decoder. naming; False the flat
    PackNet01/PackNetSlim01/PackNetSlimSAN01 naming."""
    p = jax_to_np(variables['params'])
    core = p['core']
    sd = {}

    def prefix(name):
        if not nested:
            return name + '.'
        side = 'encoder' if name in _PN_ENCODER_MODS else 'decoder'
        return '{}.{}.'.format(side, name)

    _pn_conv2d_to(sd, prefix('pre_calc'), core['pre_calc'])
    _pn_conv2d_to(sd, prefix('conv1'), core['conv1'])
    for name in ('conv2', 'conv3', 'conv4', 'conv5'):
        for sub, blk in core[name].items():
            i = int(sub.split('_')[1])
            _pn_residual_to(sd, prefix(name) + '{}.'.format(i), blk)
    for name in ('pack1', 'pack2', 'pack3', 'pack4', 'pack5',
                 'unpack1', 'unpack2', 'unpack3', 'unpack4', 'unpack5'):
        _pn_conv3d_to(sd, prefix(name), core[name]['_Conv3DStack_0'])
        _pn_conv2d_to(sd, prefix(name) + 'conv.', core[name]['Conv2D_0'])
    for name in ('iconv1', 'iconv2', 'iconv3', 'iconv4', 'iconv5'):
        _pn_conv2d_to(sd, prefix(name), core[name])
    for name in ('disp1_layer', 'disp2_layer', 'disp3_layer', 'disp4_layer'):
        sd[prefix(name) + 'conv1.weight'] = \
            _k_inv(core[name]['Conv_0']['kernel'])
        sd[prefix(name) + 'conv1.bias'] = \
            np.asarray(core[name]['Conv_0']['bias'])
    if 'mconvs' in p:
        _mconvs_to_reference(p['mconvs'],
                             jax_to_np(variables['batch_stats'])['mconvs'],
                             sd, me_kernel_order)
        sd['weight'] = np.asarray(p['weight'])
        sd['bias'] = np.asarray(p['bias'])
    return sd


def load_reference_packnet_checkpoint(variables, path_or_sd,
                                      key='depth_net',
                                      me_kernel_order='first_axis_fastest'):
    """Merge a FULL reference PackNet-family checkpoint into our flax
    variables (fail-loud; same prefix-anywhere handling as the ResNetSAN01
    loader)."""
    if isinstance(path_or_sd, (str, bytes)):
        import torch
        ckpt = torch.load(path_or_sd, map_location='cpu', weights_only=False)
        sd = ckpt.get('state_dict', ckpt)
    else:
        sd = path_or_sd
    sd = {k: np.asarray(v) for k, v in sd.items()}
    rel = strip_reference_prefix(sd, key) if any(
        (key + '.') in k for k in sd) else sd
    params, stats = reference_packnet_to_flax(rel, variables, me_kernel_order)
    import jax
    import jax.numpy as jnp

    def to_jnp(t):
        return jax.tree_util.tree_map(jnp.asarray, t)

    new_vars = {k: dict(v) for k, v in variables.items()}
    merged_p = dict(new_vars['params'])
    merged_p.update(to_jnp(params))
    new_vars['params'] = merged_p
    if stats:
        merged_s = dict(new_vars.get('batch_stats', {}))
        merged_s.update(to_jnp(stats))
        new_vars['batch_stats'] = merged_s
    return new_vars


########################################################################################################################
# Pose nets: PoseNet (SfmLearner conv_gn stack, reference
# networks/pose/PoseNet.py:38-84) and PoseResNet (2-image torchvision
# encoder + monodepth2 PoseDecoder, PoseResNet.py:25-47 /
# layers/resnet/pose_decoder.py:14-32 where net.0=squeeze, net.1..3=pose_0..2)


def reference_pose_net_to_flax(sd):
    """reference pose_net state_dict (keys relative to pose_net) ->
    (params, batch_stats); the net kind is inferred from the keys."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if any(k.startswith('pose_pred.') for k in sd):     # PoseNet
        params = {}
        for i in range(1, 8):
            pre = 'conv{}.'.format(i)
            params['conv{}'.format(i)] = {
                'Conv_0': {'kernel': _k(sd[pre + '0.weight']),
                           'bias': np.asarray(sd[pre + '0.bias'])},
                'GroupNorm_0': {'scale': np.asarray(sd[pre + '1.weight']),
                                'bias': np.asarray(sd[pre + '1.bias'])}}
        params['pose_pred'] = {'kernel': _k(sd['pose_pred.weight']),
                               'bias': np.asarray(sd['pose_pred.bias'])}
        return params, {}
    # PoseResNet
    enc_sd = {k[len('encoder.encoder.'):]: v for k, v in sd.items()
              if k.startswith('encoder.encoder.')}
    num_layers = _infer_tv_num_layers(enc_sd)
    enc_p, enc_s = torchvision_resnet_to_flax(enc_sd, num_layers,
                                              num_input_images=1)
    # (the 2-image first conv is stored at its full 6-channel width in the
    # checkpoint, so num_input_images=1 keeps it verbatim)
    dec_p = {}
    for n, name in enumerate(['squeeze_0', 'pose_0', 'pose_1', 'pose_2']):
        pre = 'decoder.net.{}.'.format(n)
        dec_p[name] = {'kernel': _k(sd[pre + 'weight']),
                       'bias': np.asarray(sd[pre + 'bias'])}
    return {'encoder': enc_p, 'decoder': dec_p}, {'encoder': enc_s}


def flax_to_reference_pose_net(variables_or_params, batch_stats=None):
    """Inverse of reference_pose_net_to_flax."""
    if 'params' in variables_or_params and isinstance(
            variables_or_params.get('params'), dict):
        p = jax_to_np(variables_or_params['params'])
        s = jax_to_np(variables_or_params.get('batch_stats', {}))
    else:
        p = jax_to_np(variables_or_params)
        s = jax_to_np(batch_stats or {})
    sd = {}
    if 'pose_pred' in p:                                # PoseNet
        for i in range(1, 8):
            cp = p['conv{}'.format(i)]
            pre = 'conv{}.'.format(i)
            sd[pre + '0.weight'] = _k_inv(cp['Conv_0']['kernel'])
            sd[pre + '0.bias'] = np.asarray(cp['Conv_0']['bias'])
            sd[pre + '1.weight'] = np.asarray(cp['GroupNorm_0']['scale'])
            sd[pre + '1.bias'] = np.asarray(cp['GroupNorm_0']['bias'])
        sd['pose_pred.weight'] = _k_inv(p['pose_pred']['kernel'])
        sd['pose_pred.bias'] = np.asarray(p['pose_pred']['bias'])
        return sd
    # PoseResNet: shared torchvision-encoder exporter
    ep, es = p['encoder'], s['encoder']
    _export_tv_encoder(sd, 'encoder.encoder.', ep, es,
                       _infer_flax_num_layers(ep))
    for n, name in enumerate(['squeeze_0', 'pose_0', 'pose_1', 'pose_2']):
        pre = 'decoder.net.{}.'.format(n)
        sd[pre + 'weight'] = _k_inv(p['decoder'][name]['kernel'])
        sd[pre + 'bias'] = np.asarray(p['decoder'][name]['bias'])
    return sd
