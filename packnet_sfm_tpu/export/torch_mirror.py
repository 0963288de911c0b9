"""
Torch mirror of the ResNetSAN01 eval path for ONNX export.

The reference ships its NPU deployment path via torch.onnx
(reference: scripts/onnx_conversion/convert_to_onnx.py:23-60 — an RGB-only
wrapper producing a single depth tensor, optional dual-head export). Our
training stack is JAX, so export goes:

    flax params  --(name-mapped conversion)-->  torch mirror  --> ONNX

The mirror re-states the eval graph (ResNet encoder + DepthDecoder /
DualHeadDepthDecoder) in torch.nn with weights converted from the flax
variables (HWIO -> OIHW kernels, BN scale/bias + running stats). This also
doubles as the PyTorch checkpoint interop layer for parity evaluations.

Only inference (use_running_average BatchNorm) is mirrored. ResNet 18/34
(BasicBlock) and 50 (Bottleneck) supported — the reference builds all three
from torchvision (resnet_encoder.py:61-98) and publishes a ResNet50-SAN
(28.5 M params); SAN/Film branches are excluded from export exactly like
the reference's RGB-only ONNX wrapper.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _t(kernel):
    """HWIO -> OIHW torch conv weight."""
    return torch.from_numpy(np.transpose(np.asarray(kernel), (3, 2, 0, 1)).copy())


def _v(x):
    return torch.from_numpy(np.asarray(x).copy())


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + r)


class _Bottleneck(nn.Module):
    """torchvision ResNet-V1.5 Bottleneck (stride on the 3x3), mirroring our
    flax Bottleneck (networks/layers/resnet.py:54) for parity/export."""

    def __init__(self, cin, width, stride):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + r)


# (num_layers -> stage layout; 50+ uses Bottleneck with 4x expansion)
_BLOCKS = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3]}


def resnet_num_ch_enc(num_layers):
    ch = [64, 64, 128, 256, 512]
    if num_layers > 34:
        ch = [ch[0]] + [c * 4 for c in ch[1:]]
    return ch


class TorchResnetEncoder(nn.Module):
    def __init__(self, num_layers=18):
        super().__init__()
        blocks = _BLOCKS[num_layers]
        bottleneck = num_layers > 34
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        layers = []
        cin = 64
        for stage, (width, n) in enumerate(zip([64, 128, 256, 512], blocks)):
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                if bottleneck:
                    layers.append(_Bottleneck(cin, width, stride))
                    cin = width * 4
                else:
                    layers.append(_BasicBlock(cin, width, stride))
                    cin = width
        self.blocks = nn.ModuleList(layers)
        self.stage_ends = np.cumsum(blocks).tolist()

    def forward(self, x):
        x = (x - 0.45) / 0.225
        feats = []
        x = F.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = F.max_pool2d(x, 3, 2, 1)
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if (i + 1) in self.stage_ends:
                feats.append(x)
        return feats


class TorchDepthDecoder(nn.Module):
    def __init__(self, num_ch_enc=(64, 64, 128, 256, 512), dual_head=False):
        super().__init__()
        self.dual_head = dual_head
        num_ch_dec = [16, 32, 64, 128, 256]
        self.upconv0 = nn.ModuleDict()
        self.upconv1 = nn.ModuleDict()
        for i in range(4, -1, -1):
            cin = num_ch_enc[-1] if i == 4 else num_ch_dec[i + 1]
            self.upconv0[str(i)] = nn.Conv2d(cin, num_ch_dec[i], 3, 1, 1)
            cin = num_ch_dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
            self.upconv1[str(i)] = nn.Conv2d(cin, num_ch_dec[i], 3, 1, 1)
        if dual_head:
            self.integer_conv = nn.Conv2d(num_ch_dec[0], 1, 3, 1, 1)
            self.fractional_conv = nn.Conv2d(num_ch_dec[0], 1, 3, 1, 1)
        else:
            self.dispconv = nn.Conv2d(num_ch_dec[0], 1, 3, 1, 1)

    def forward(self, feats):
        x = feats[-1]
        for i in range(4, -1, -1):
            x = F.relu(self.upconv0[str(i)](x))
            x = F.interpolate(x, scale_factor=2, mode='nearest')
            if i > 0:
                x = torch.cat([x, feats[i - 1]], 1)
            x = F.relu(self.upconv1[str(i)](x))
        if self.dual_head:
            return (torch.sigmoid(self.integer_conv(x)),
                    torch.sigmoid(self.fractional_conv(x)))
        return torch.sigmoid(self.dispconv(x))


class TorchDepthNet(nn.Module):
    """RGB-only eval wrapper: rgb [B,3,H,W] -> depth [B,1,H,W]
    (single-tensor output, reference convert_to_onnx.py:23-40)."""

    def __init__(self, num_layers=18, dual_head=False, min_depth=0.5,
                 max_depth=80.0, use_log_space=False):
        super().__init__()
        self.encoder = TorchResnetEncoder(num_layers)
        self.decoder = TorchDepthDecoder(resnet_num_ch_enc(num_layers),
                                         dual_head=dual_head)
        self.dual_head = dual_head
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.use_log_space = use_log_space

    def forward(self, rgb):
        feats = self.encoder(rgb)
        out = self.decoder(feats)
        if self.dual_head:
            integer, frac = out
            return integer * self.max_depth + frac
        min_inv, max_inv = 1.0 / self.max_depth, 1.0 / self.min_depth
        if self.use_log_space:
            log_min, log_max = np.log(min_inv), np.log(max_inv)
            inv = torch.exp(log_min + (log_max - log_min) * out)
        else:
            inv = min_inv + (max_inv - min_inv) * out
        return 1.0 / (inv + 1e-8)


########################################################################################################################
# flax -> torch weight conversion


def _load_bn(bn, params, stats):
    bn.weight.data = _v(params['scale'])
    bn.bias.data = _v(params['bias'])
    bn.running_mean.data = _v(stats['mean'])
    bn.running_var.data = _v(stats['var'])


def load_resnet_san_into_torch(variables, num_layers=18, dual_head=False,
                               min_depth=0.5, max_depth=80.0,
                               use_log_space=False):
    """Build a TorchDepthNet from ResNetSAN01 flax variables."""
    p_enc = variables['params']['encoder']
    s_enc = variables['batch_stats']['encoder']
    net = TorchDepthNet(num_layers, dual_head, min_depth, max_depth,
                        use_log_space)

    net.encoder.conv1.weight.data = _t(p_enc['Conv_0']['kernel'])
    _load_bn(net.encoder.bn1, p_enc['BatchNorm_0'], s_enc['BatchNorm_0'])

    n_blocks = sum(_BLOCKS[num_layers])
    blk_cls = 'Bottleneck' if num_layers > 34 else 'BasicBlock'
    n_main = 3 if num_layers > 34 else 2
    for b in range(n_blocks):
        pb = p_enc['{}_{}'.format(blk_cls, b)]
        sb = s_enc['{}_{}'.format(blk_cls, b)]
        blk = net.encoder.blocks[b]
        for j in range(n_main):
            getattr(blk, 'conv{}'.format(j + 1)).weight.data = \
                _t(pb['Conv_{}'.format(j)]['kernel'])
            _load_bn(getattr(blk, 'bn{}'.format(j + 1)),
                     pb['BatchNorm_{}'.format(j)],
                     sb['BatchNorm_{}'.format(j)])
        if blk.down is not None:
            blk.down[0].weight.data = _t(pb['Conv_{}'.format(n_main)]['kernel'])
            _load_bn(blk.down[1], pb['BatchNorm_{}'.format(n_main)],
                     sb['BatchNorm_{}'.format(n_main)])

    p_dec = variables['params']['decoder']
    for i in range(5):
        for j, mod in ((0, net.decoder.upconv0), (1, net.decoder.upconv1)):
            pd = p_dec['upconv_{}_{}'.format(i, j)]['Conv_0']
            mod[str(i)].weight.data = _t(pd['kernel'])
            mod[str(i)].bias.data = _v(pd['bias'])
    if dual_head:
        for name, conv in (('integer_conv_0', net.decoder.integer_conv),
                           ('fractional_conv_0', net.decoder.fractional_conv)):
            pd = p_dec[name]['Conv_0']
            conv.weight.data = _t(pd['kernel'])
            conv.bias.data = _v(pd['bias'])
    else:
        pd = p_dec['dispconv_0']['Conv_0']
        net.decoder.dispconv.weight.data = _t(pd['kernel'])
        net.decoder.dispconv.bias.data = _v(pd['bias'])
    net.eval()
    return net


def export_onnx(net, path, height=384, width=640, opset=13):
    """Export the RGB-only wrapper to ONNX (reference opset 10-13 range).

    When the `onnx` package is absent (this image ships without it), exports
    a TorchScript trace next to the requested path instead — an equivalent
    single-file deployment artifact — and returns that path.
    """
    dummy = torch.zeros(1, 3, height, width)
    try:
        torch.onnx.export(net, dummy, path, opset_version=opset,
                          input_names=['rgb'], output_names=['depth'],
                          do_constant_folding=True)
        return path
    except (ModuleNotFoundError, ImportError) as e:
        ts_path = path.rsplit('.', 1)[0] + '.torchscript.pt'
        traced = torch.jit.trace(net, dummy)
        traced.save(ts_path)
        print('[export] onnx unavailable ({}); saved TorchScript to {}'
              .format(e, ts_path))
        return ts_path


########################################################################################################################
# PackNet family torch mirror (RGB eval path of PackNet01 / PackNetSlim01 /
# PackNetSAN01 / PackNetSlimSAN01 — the SAN fusion is inactive without
# input_depth, reference PackNetSAN01.py:196-210). Semantics re-derived from
# reference networks/layers/packnet/layers01.py (Conv2D :10-37, ResidualConv
# :40-72, InvDepth :98-122, packing :126-149, PackLayerConv3d :213-247,
# UnpackLayerConv3d :250-285) — used by the ONNX/TorchScript export flow and
# as the cross-framework witness for checkpoint transport.


class TorchPNConv2D(nn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.pad = nn.ConstantPad2d([k // 2] * 4, 0.0)
        self.conv = nn.Conv2d(cin, cout, k, stride)
        self.gn = nn.GroupNorm(16, cout)

    def forward(self, x):
        return torch.nn.functional.elu(self.gn(self.conv(self.pad(x))))


class TorchPNResidualConv(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = TorchPNConv2D(cin, cout, 3, stride)
        self.conv2 = TorchPNConv2D(cout, cout, 3, 1)
        self.conv3 = nn.Conv2d(cin, cout, 1, stride)
        self.gn = nn.GroupNorm(16, cout)

    def forward(self, x):
        return torch.nn.functional.elu(
            self.gn(self.conv2(self.conv1(x)) + self.conv3(x)))


def _pn_residual_block(cin, cout, n, stride):
    layers = [TorchPNResidualConv(cin, cout, stride)]
    for _ in range(1, n):
        layers.append(TorchPNResidualConv(cout, cout, 1))
    return nn.Sequential(*layers)


class TorchPNInvDepth(nn.Module):
    def __init__(self, cin, min_depth=0.5):
        super().__init__()
        self.pad = nn.ConstantPad2d([1] * 4, 0.0)
        self.conv = nn.Conv2d(cin, 1, 3, 1)
        self.min_depth = min_depth

    def forward(self, x):
        return torch.sigmoid(self.conv(self.pad(x))) / self.min_depth


def _pn_packing(x, r=2):
    b, c, h, w = x.shape
    x = x.view(b, c, h // r, r, w // r, r)
    return x.permute(0, 1, 3, 5, 2, 4).reshape(b, c * r * r, h // r, w // r)


class TorchPackLayerConv3d(nn.Module):
    def __init__(self, cin, k, r=2, d=8):
        super().__init__()
        self.r = r
        self.conv3d = nn.Conv3d(1, d, (3, 3, 3), padding=(1, 1, 1))
        self.conv = TorchPNConv2D(cin * r * r * d, cin, k, 1)

    def forward(self, x):
        x = _pn_packing(x, self.r).unsqueeze(1)
        x = self.conv3d(x)
        b, c, d_, h, w = x.shape
        return self.conv(x.reshape(b, c * d_, h, w))


class TorchUnpackLayerConv3d(nn.Module):
    def __init__(self, cin, cout, k, r=2, d=8):
        super().__init__()
        self.conv = TorchPNConv2D(cin, cout * r * r // d, k, 1)
        self.conv3d = nn.Conv3d(1, d, (3, 3, 3), padding=(1, 1, 1))
        self.unpack = nn.PixelShuffle(r)

    def forward(self, x):
        x = self.conv(x).unsqueeze(1)
        x = self.conv3d(x)
        b, c, d_, h, w = x.shape
        return self.unpack(x.reshape(b, c * d_, h, w))


class TorchPackNet(nn.Module):
    """PackNet01-family RGB depth net, version A skips (concat)."""

    def __init__(self, ni=64, channels=(64, 64, 128, 256, 512),
                 num_3d_feat=8, min_depth=0.5):
        super().__init__()
        n1, n2, n3, n4, n5 = channels
        nb = [2, 2, 3, 3]
        d = num_3d_feat
        no = 1
        self.pre_calc = TorchPNConv2D(3, ni, 5, 1)
        self.conv1 = TorchPNConv2D(ni, n1, 7, 1)
        self.conv2 = _pn_residual_block(n1, n2, nb[0], 1)
        self.conv3 = _pn_residual_block(n2, n3, nb[1], 1)
        self.conv4 = _pn_residual_block(n3, n4, nb[2], 1)
        self.conv5 = _pn_residual_block(n4, n5, nb[3], 1)
        self.pack1 = TorchPackLayerConv3d(n1, 5, d=d)
        self.pack2 = TorchPackLayerConv3d(n2, 3, d=d)
        self.pack3 = TorchPackLayerConv3d(n3, 3, d=d)
        self.pack4 = TorchPackLayerConv3d(n4, 3, d=d)
        self.pack5 = TorchPackLayerConv3d(n5, 3, d=d)
        self.unpack5 = TorchUnpackLayerConv3d(n5, n5, 3, d=d)
        self.unpack4 = TorchUnpackLayerConv3d(n5, n4, 3, d=d)
        self.unpack3 = TorchUnpackLayerConv3d(n4, n3, 3, d=d)
        self.unpack2 = TorchUnpackLayerConv3d(n3, n2, 3, d=d)
        self.unpack1 = TorchUnpackLayerConv3d(n2, n1, 3, d=d)
        self.iconv5 = TorchPNConv2D(n5 + n4, n5, 3, 1)
        self.iconv4 = TorchPNConv2D(n4 + n3, n4, 3, 1)
        self.iconv3 = TorchPNConv2D(n3 + n2 + no, n3, 3, 1)
        self.iconv2 = TorchPNConv2D(n2 + n1 + no, n2, 3, 1)
        self.iconv1 = TorchPNConv2D(n1 + ni + no, n1, 3, 1)
        self.disp4_layer = TorchPNInvDepth(n4, min_depth)
        self.disp3_layer = TorchPNInvDepth(n3, min_depth)
        self.disp2_layer = TorchPNInvDepth(n2, min_depth)
        self.disp1_layer = TorchPNInvDepth(n1, min_depth)

    def forward(self, rgb):
        up = nn.functional.interpolate
        x = self.pre_calc(rgb)
        x1 = self.conv1(x)
        x1p = self.pack1(x1)
        x2 = self.conv2(x1p)
        x2p = self.pack2(x2)
        x3 = self.conv3(x2p)
        x3p = self.pack3(x3)
        x4 = self.conv4(x3p)
        x4p = self.pack4(x4)
        x5 = self.conv5(x4p)
        x5p = self.pack5(x5)

        iconv5 = self.iconv5(torch.cat(
            (self.unpack5(x5p), x4p), 1))
        iconv4 = self.iconv4(torch.cat(
            (self.unpack4(iconv5), x3p), 1))
        disp4 = self.disp4_layer(iconv4)
        udisp4 = up(disp4, scale_factor=2, mode='nearest')
        iconv3 = self.iconv3(torch.cat(
            (self.unpack3(iconv4), x2p, udisp4), 1))
        disp3 = self.disp3_layer(iconv3)
        udisp3 = up(disp3, scale_factor=2, mode='nearest')
        iconv2 = self.iconv2(torch.cat(
            (self.unpack2(iconv3), x1p, udisp3), 1))
        disp2 = self.disp2_layer(iconv2)
        udisp2 = up(disp2, scale_factor=2, mode='nearest')
        iconv1 = self.iconv1(torch.cat(
            (self.unpack1(iconv2), x, udisp2), 1))
        disp1 = self.disp1_layer(iconv1)
        return disp1, disp2, disp3, disp4


def _load_pn_conv2d(mod, p):
    mod.conv.weight.data = _t(p['Conv_0']['kernel'])
    mod.conv.bias.data = _v(p['Conv_0']['bias'])
    mod.gn.weight.data = _v(p['GroupNorm_0']['scale'])
    mod.gn.bias.data = _v(p['GroupNorm_0']['bias'])


def _load_pn_residual(mod, p):
    _load_pn_conv2d(mod.conv1, p['Conv2D_0'])
    _load_pn_conv2d(mod.conv2, p['Conv2D_1'])
    mod.conv3.weight.data = _t(p['Conv_0']['kernel'])
    mod.conv3.bias.data = _v(p['Conv_0']['bias'])
    mod.gn.weight.data = _v(p['GroupNorm_0']['scale'])
    mod.gn.bias.data = _v(p['GroupNorm_0']['bias'])


def _load_pn_conv3d(mod, p):
    import numpy as np
    stack = p['_Conv3DStack_0']
    if 'win2d' in stack:       # depthwin2d impl: [kh,kw,dz,j]
        k = np.asarray(stack['win2d']['kernel'])
        b = np.asarray(stack['win2d']['bias'])
    elif 'win2d_kernel' in stack:  # depthwise impl: same layout
        k = np.asarray(stack['win2d_kernel'])
        b = np.asarray(stack['win2d_bias'])
    else:                      # literal conv3d impl: [kd,kh,kw,1,j]
        k3 = np.asarray(stack['Conv_0']['kernel'])
        mod.conv3d.weight.data = torch.from_numpy(
            np.ascontiguousarray(k3.transpose(4, 3, 0, 1, 2)))
        mod.conv3d.bias.data = torch.from_numpy(
            np.asarray(stack['Conv_0']['bias']).copy())
        return
    # w3d[j, 0, dz, kh, kw] = win2d[kh, kw, dz, j]
    mod.conv3d.weight.data = torch.from_numpy(
        np.ascontiguousarray(k.transpose(3, 2, 0, 1)[:, None]))
    mod.conv3d.bias.data = torch.from_numpy(b.copy())


def load_packnet_into_torch(variables, ni=64,
                            channels=(64, 64, 128, 256, 512),
                            num_3d_feat=8, min_depth=0.5):
    """Build a TorchPackNet from PackNet01-family flax variables (the
    'core' subtree; all three CONV3D_IMPL weight layouts accepted)."""
    core = variables['params']['core']
    net = TorchPackNet(ni=ni, channels=channels, num_3d_feat=num_3d_feat,
                       min_depth=min_depth)
    _load_pn_conv2d(net.pre_calc, core['pre_calc'])
    _load_pn_conv2d(net.conv1, core['conv1'])
    for name in ('conv2', 'conv3', 'conv4', 'conv5'):
        blocks = getattr(net, name)
        sub = core[name]
        for i, blk in enumerate(blocks):
            _load_pn_residual(blk, sub['ResidualConv_{}'.format(i)])
    for name in ('pack1', 'pack2', 'pack3', 'pack4', 'pack5',
                 'unpack1', 'unpack2', 'unpack3', 'unpack4', 'unpack5'):
        mod = getattr(net, name)
        _load_pn_conv3d(mod, core[name])
        _load_pn_conv2d(mod.conv, core[name]['Conv2D_0'])
    for name in ('iconv1', 'iconv2', 'iconv3', 'iconv4', 'iconv5'):
        _load_pn_conv2d(getattr(net, name), core[name])
    for name in ('disp1_layer', 'disp2_layer', 'disp3_layer', 'disp4_layer'):
        mod = getattr(net, name)
        p = core[name]['Conv_0']
        mod.conv.weight.data = _t(p['kernel'])
        mod.conv.bias.data = _v(p['bias'])
    net.eval()
    return net
