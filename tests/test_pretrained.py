"""
Pretrained-weight pipeline: torchvision-format ResNet import (numeric golden
vs a torch execution of the SAME weights), ultralytics YOLOv8 import
round-trip, and the fail-loud trainer behaviour for 'pt' configs.

torchvision itself is not installed in the zero-egress image, so the golden
runs a faithful torch BasicBlock ResNet (export/torch_mirror.TorchResnetEncoder,
already parity-tested against the flax encoder) loaded with a synthesized
torchvision-layout state_dict. This pins every mapping detail the real
weights depend on: OIHW->HWIO transposes, BN scale/bias/running-stat slots,
downsample branch keys (reference: networks/layers/resnet/resnet_encoder.py:61-98).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from packnet_sfm_tpu.export.torch_import import (

    torchvision_resnet_to_flax, yolov8_backbone_to_flax,
    load_pretrained_encoder, PretrainedWeightsNotFound)

pytestmark = pytest.mark.quick


def synth_torchvision_resnet18_sd(seed=0):
    """Random state_dict with exact torchvision resnet18 keys/shapes."""
    rng = np.random.RandomState(seed)

    def conv(cout, cin, k):
        return torch.from_numpy(
            rng.randn(cout, cin, k, k).astype(np.float32) * 0.05)

    def bn(c, prefix, sd):
        sd[prefix + '.weight'] = torch.from_numpy(
            (rng.rand(c) * 0.5 + 0.75).astype(np.float32))
        sd[prefix + '.bias'] = torch.from_numpy(
            (rng.randn(c) * 0.1).astype(np.float32))
        sd[prefix + '.running_mean'] = torch.from_numpy(
            (rng.randn(c) * 0.1).astype(np.float32))
        sd[prefix + '.running_var'] = torch.from_numpy(
            (rng.rand(c) * 0.5 + 0.5).astype(np.float32))

    sd = {'conv1.weight': conv(64, 3, 7)}
    bn(64, 'bn1', sd)
    widths = [64, 128, 256, 512]
    cin = 64
    for stage in range(4):
        w = widths[stage]
        for blk in range(2):
            pre = 'layer{}.{}.'.format(stage + 1, blk)
            stride_block = (stage > 0 and blk == 0)
            sd[pre + 'conv1.weight'] = conv(w, cin if blk == 0 else w, 3)
            bn(w, pre + 'bn1', sd)
            sd[pre + 'conv2.weight'] = conv(w, w, 3)
            bn(w, pre + 'bn2', sd)
            if stride_block or (blk == 0 and cin != w):
                sd[pre + 'downsample.0.weight'] = conv(w, cin, 1)
                bn(w, pre + 'downsample.1', sd)
        cin = w
    return sd


def test_torchvision_import_numeric_golden():
    """flax encoder with imported weights == torch encoder with the same
    state_dict, on all 5 feature scales."""
    from packnet_sfm_tpu.networks.layers.resnet import ResnetEncoder
    from packnet_sfm_tpu.export.torch_mirror import TorchResnetEncoder

    sd = synth_torchvision_resnet18_sd()

    # torch side: TorchResnetEncoder stores blocks as a flat ModuleList in
    # torchvision's layer-stage order.
    tenc = TorchResnetEncoder(18)
    blocks = {18: [2, 2, 2, 2]}[18]
    i = 0
    with torch.no_grad():
        tenc.conv1.weight.copy_(sd['conv1.weight'])
        tenc.bn1.weight.copy_(sd['bn1.weight'])
        tenc.bn1.bias.copy_(sd['bn1.bias'])
        tenc.bn1.running_mean.copy_(sd['bn1.running_mean'])
        tenc.bn1.running_var.copy_(sd['bn1.running_var'])
        for stage in range(4):
            for blk in range(blocks[stage]):
                pre = 'layer{}.{}.'.format(stage + 1, blk)
                tb = tenc.blocks[i]
                tb.conv1.weight.copy_(sd[pre + 'conv1.weight'])
                tb.bn1.weight.copy_(sd[pre + 'bn1.weight'])
                tb.bn1.bias.copy_(sd[pre + 'bn1.bias'])
                tb.bn1.running_mean.copy_(sd[pre + 'bn1.running_mean'])
                tb.bn1.running_var.copy_(sd[pre + 'bn1.running_var'])
                tb.conv2.weight.copy_(sd[pre + 'conv2.weight'])
                tb.bn2.weight.copy_(sd[pre + 'bn2.weight'])
                tb.bn2.bias.copy_(sd[pre + 'bn2.bias'])
                tb.bn2.running_mean.copy_(sd[pre + 'bn2.running_mean'])
                tb.bn2.running_var.copy_(sd[pre + 'bn2.running_var'])
                if pre + 'downsample.0.weight' in sd:
                    tb.down[0].weight.copy_(sd[pre + 'downsample.0.weight'])
                    tb.down[1].weight.copy_(sd[pre + 'downsample.1.weight'])
                    tb.down[1].bias.copy_(sd[pre + 'downsample.1.bias'])
                    tb.down[1].running_mean.copy_(
                        sd[pre + 'downsample.1.running_mean'])
                    tb.down[1].running_var.copy_(
                        sd[pre + 'downsample.1.running_var'])
                i += 1
    tenc.eval()

    # flax side via the importer
    enc = ResnetEncoder(num_layers=18)
    rng = np.random.RandomState(1)
    x = rng.rand(2, 64, 96, 3).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params, stats = torchvision_resnet_to_flax(
        {k: v.numpy() for k, v in sd.items()}, 18)
    feats = enc.apply(
        {'params': jax.tree_util.tree_map(jnp.asarray, params),
         'batch_stats': jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x), train=False)

    with torch.no_grad():
        tfeats = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    # structure check: importer tree matches the model's init tree exactly
    jax.tree_util.tree_map(
        lambda a, b: None,
        variables['params'], jax.tree_util.tree_map(jnp.asarray, params))

    assert len(feats) == len(tfeats) == 5
    for f, tf in zip(feats, tfeats):
        # synthesized (un-normalized) weights blow activations to O(100)
        # after 8 blocks; fp32 accumulation-order noise reaches ~1e-2
        # relative on 0.1% of elements. A wrong mapping (transpose/slot
        # swap) produces O(1) relative error everywhere.
        np.testing.assert_allclose(
            np.asarray(f), tf.numpy().transpose(0, 2, 3, 1),
            rtol=2e-2, atol=2e-2)


def _flax_to_ultralytics_sd(params, stats):
    """Inverse mapping (for the round-trip test): flax YOLOv8Backbone tree ->
    ultralytics state_dict key layout."""
    def conv_bn(p, s, prefix, sd):
        sd[prefix + 'conv.weight'] = np.transpose(
            np.asarray(p['Conv_0']['kernel']), (3, 2, 0, 1))
        sd[prefix + 'bn.weight'] = np.asarray(p['BatchNorm_0']['scale'])
        sd[prefix + 'bn.bias'] = np.asarray(p['BatchNorm_0']['bias'])
        sd[prefix + 'bn.running_mean'] = np.asarray(s['BatchNorm_0']['mean'])
        sd[prefix + 'bn.running_var'] = np.asarray(s['BatchNorm_0']['var'])

    sd = {}
    for li, name in [(0, 'ConvBnSiLU_0'), (1, 'ConvBnSiLU_1'),
                     (3, 'ConvBnSiLU_2'), (5, 'ConvBnSiLU_3'),
                     (7, 'ConvBnSiLU_4')]:
        conv_bn(params[name], stats[name], 'model.{}.'.format(li), sd)
    for li, name in [(2, 'C2f_0'), (4, 'C2f_1'), (6, 'C2f_2'), (8, 'C2f_3')]:
        p, s = params[name], stats[name]
        conv_bn(p['ConvBnSiLU_0'], s['ConvBnSiLU_0'],
                'model.{}.cv1.'.format(li), sd)
        conv_bn(p['ConvBnSiLU_1'], s['ConvBnSiLU_1'],
                'model.{}.cv2.'.format(li), sd)
        i = 0
        while 'Bottleneck_{}'.format(i) in p:
            bp = p['Bottleneck_{}'.format(i)]
            bs = s['Bottleneck_{}'.format(i)]
            conv_bn(bp['ConvBnSiLU_0'], bs['ConvBnSiLU_0'],
                    'model.{}.m.{}.cv1.'.format(li, i), sd)
            conv_bn(bp['ConvBnSiLU_1'], bs['ConvBnSiLU_1'],
                    'model.{}.m.{}.cv2.'.format(li, i), sd)
            i += 1
    conv_bn(params['SPPF_0']['ConvBnSiLU_0'], stats['SPPF_0']['ConvBnSiLU_0'],
            'model.9.cv1.', sd)
    conv_bn(params['SPPF_0']['ConvBnSiLU_1'], stats['SPPF_0']['ConvBnSiLU_1'],
            'model.9.cv2.', sd)
    return sd


def test_yolov8_import_roundtrip():
    """ultralytics-layout sd -> importer -> exactly the backbone init tree."""
    from packnet_sfm_tpu.networks.layers.yolov8 import YOLOv8Backbone

    bb = YOLOv8Backbone(variant='n')
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    sd = _flax_to_ultralytics_sd(variables['params'],
                                 variables['batch_stats'])
    params, stats = yolov8_backbone_to_flax(sd, variant='n')

    flat_a = jax.tree_util.tree_leaves_with_path(variables['params'])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(jnp.asarray, params)))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), err_msg=str(path))
    flat_sa = jax.tree_util.tree_leaves_with_path(variables['batch_stats'])
    flat_sb = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(jnp.asarray, stats)))
    assert len(flat_sa) == len(flat_sb)
    for path, leaf in flat_sa:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_sb[path]), err_msg=str(path))


def test_required_missing_weights_raises(tmp_path, monkeypatch):
    monkeypatch.setenv('PACKNET_WEIGHTS_DIR', str(tmp_path))  # empty dir
    monkeypatch.delenv('HOME', raising=False)
    with pytest.raises(PretrainedWeightsNotFound):
        load_pretrained_encoder({'params': {}, 'batch_stats': {}},
                                18, required=True)


def test_trainer_pt_config_fail_loud(tmp_path, monkeypatch):
    """'18pt' refuses to run without weights; allow_random_init opts out;
    an explicit weights_path loads the file (reference accuracy depends on
    these weights — resnet_encoder.py:61-98)."""
    from packnet_sfm_tpu.config import parse_train_config
    from packnet_sfm_tpu.trainers.trainer import Trainer, _to_device_batch

    monkeypatch.setenv('PACKNET_WEIGHTS_DIR', str(tmp_path / 'empty'))

    def make_trainer():
        cfg = parse_train_config('configs/overfit_synthetic.yaml')
        cfg.arch.max_epochs = 1
        cfg.model.depth_net.version = '18pt'
        return cfg

    def setup(cfg):
        trainer = Trainer(cfg)
        loader = trainer._make_loader('train')
        trainer._steps_per_epoch = 2
        trainer.setup(_to_device_batch(next(iter(loader)), trainer.mesh))
        return trainer

    with pytest.raises(PretrainedWeightsNotFound):
        setup(make_trainer())

    cfg = make_trainer()
    cfg.model.depth_net.allow_random_init = True
    setup(cfg)  # must not raise

    # explicit weights_path: the synthesized file actually loads
    sd = synth_torchvision_resnet18_sd(seed=3)
    path = tmp_path / 'resnet18-synth.pth'
    torch.save(sd, str(path))
    cfg = make_trainer()
    cfg.model.depth_net.weights_path = str(path)
    trainer = setup(cfg)
    got = np.asarray(
        trainer.state.params['depth_net']['encoder']['Conv_0']['kernel'])
    want = sd['conv1.weight'].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
