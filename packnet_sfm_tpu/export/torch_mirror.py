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
(BasicBlock) supported; SAN/Film branches are excluded from export exactly
like the reference's RGB-only ONNX wrapper.
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


class TorchResnetEncoder(nn.Module):
    def __init__(self, num_layers=18):
        super().__init__()
        blocks = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3]}[num_layers]
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        layers = []
        cin = 64
        for stage, (width, n) in enumerate(zip([64, 128, 256, 512], blocks)):
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
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
        self.decoder = TorchDepthDecoder(dual_head=dual_head)
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

    n_blocks = {18: 8, 34: 16}[num_layers]
    for b in range(n_blocks):
        pb = p_enc['BasicBlock_{}'.format(b)]
        sb = s_enc['BasicBlock_{}'.format(b)]
        blk = net.encoder.blocks[b]
        blk.conv1.weight.data = _t(pb['Conv_0']['kernel'])
        _load_bn(blk.bn1, pb['BatchNorm_0'], sb['BatchNorm_0'])
        blk.conv2.weight.data = _t(pb['Conv_1']['kernel'])
        _load_bn(blk.bn2, pb['BatchNorm_1'], sb['BatchNorm_1'])
        if blk.down is not None:
            blk.down[0].weight.data = _t(pb['Conv_2']['kernel'])
            _load_bn(blk.down[1], pb['BatchNorm_2'], sb['BatchNorm_2'])

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
