"""
PackNet depth networks (flax.linen, NHWC).

TPU re-design of reference networks/depth/PackNet01.py:25-185,
PackNetSAN01.py:143-235, PackNetSlim01.py:8-187, PackNetSlimSAN01.py:11-281.

Shared structure: pre_calc Conv2D(5x5) -> 5x {conv/ResidualBlock +
PackLayerConv3d} encoder; 5x {UnpackLayerConv3d + skip merge (version A:
concat, B: add) + iconv} decoder; 4 InvDepth sigmoid heads. The SAN variants
fuse a sparse-LiDAR branch into the skip features with learnable per-scale
scalar weight/bias: `skip * w_i + san(skip) + b_i` (PackNetSAN01.py:202-206),
and at train time run both RGB and RGB+D passes with an MSE
feature-consistency loss (PackNetSAN01.py:220-234).
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from packnet_sfm_tpu.networks.layers.packnet import (
    Conv2D, ResidualBlock, InvDepth, PackLayerConv3d, UnpackLayerConv3d)
from packnet_sfm_tpu.networks.layers.san import (
    MinkowskiEncoder, sparsify_depth, active_row_window, crop_rows,
    paste_rows)
from packnet_sfm_tpu.ops.image import upsample2x_nearest


class _PackNetCore(nn.Module):
    """Shared PackNet encoder/decoder graph parameterized by channel plan."""
    version: str = 'A'           # 'A' concat skips, 'B' add skips
    ni: int = 64
    channels: Sequence[int] = (64, 64, 128, 256, 512)
    num_blocks: Sequence[int] = (2, 2, 3, 3)
    num_3d_feat: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ni, no = self.ni, 1
        n1, n2, n3, n4, n5 = self.channels
        pk = [5, 3, 3, 3, 3]
        if self.version == 'A':
            self.n5o, self.n5i = n5, n5 + n4
            self.n4o, self.n4i = n4, n4 + n3
            self.n3o, self.n3i = n3, n3 + n2 + no
            self.n2o, self.n2i = n2, n2 + n1 + no
            self.n1o, self.n1i = n1, n1 + ni + no
        elif self.version == 'B':
            self.n5o, self.n5i = n5 // 2, n5 // 2
            self.n4o, self.n4i = n4 // 2, n4 // 2
            self.n3o, self.n3i = n3 // 2, n3 // 2 + no
            self.n2o, self.n2i = n2, n2 + no
            self.n1o, self.n1i = n1, n1 + no
        else:
            raise ValueError('Unknown PackNet version {}'.format(self.version))

        d = self.num_3d_feat
        self.pre_calc = Conv2D(ni, 5, 1, self.dtype)
        self.conv1 = Conv2D(n1, 7, 1, self.dtype)
        self.conv2 = ResidualBlock(n2, self.num_blocks[0], 1, self.dropout, self.dtype)
        self.conv3 = ResidualBlock(n3, self.num_blocks[1], 1, self.dropout, self.dtype)
        self.conv4 = ResidualBlock(n4, self.num_blocks[2], 1, self.dropout, self.dtype)
        self.conv5 = ResidualBlock(n5, self.num_blocks[3], 1, self.dropout, self.dtype)
        self.pack1 = PackLayerConv3d(n1, pk[0], d=d, dtype=self.dtype)
        self.pack2 = PackLayerConv3d(n2, pk[1], d=d, dtype=self.dtype)
        self.pack3 = PackLayerConv3d(n3, pk[2], d=d, dtype=self.dtype)
        self.pack4 = PackLayerConv3d(n4, pk[3], d=d, dtype=self.dtype)
        self.pack5 = PackLayerConv3d(n5, pk[4], d=d, dtype=self.dtype)

        self.unpack5 = UnpackLayerConv3d(self.n5o, 3, d=d, dtype=self.dtype)
        self.unpack4 = UnpackLayerConv3d(self.n4o, 3, d=d, dtype=self.dtype)
        self.unpack3 = UnpackLayerConv3d(self.n3o, 3, d=d, dtype=self.dtype)
        self.unpack2 = UnpackLayerConv3d(self.n2o, 3, d=d, dtype=self.dtype)
        self.unpack1 = UnpackLayerConv3d(self.n1o, 3, d=d, dtype=self.dtype)
        self.iconv5 = Conv2D(n5, 3, 1, self.dtype)
        self.iconv4 = Conv2D(n4, 3, 1, self.dtype)
        self.iconv3 = Conv2D(n3, 3, 1, self.dtype)
        self.iconv2 = Conv2D(n2, 3, 1, self.dtype)
        self.iconv1 = Conv2D(n1, 3, 1, self.dtype)
        self.disp4_layer = InvDepth(dtype=self.dtype)
        self.disp3_layer = InvDepth(dtype=self.dtype)
        self.disp2_layer = InvDepth(dtype=self.dtype)
        self.disp1_layer = InvDepth(dtype=self.dtype)

    def encode(self, rgb, train=True):
        x = self.pre_calc(rgb)
        x1 = self.conv1(x)
        x1p = self.pack1(x1)
        x2 = self.conv2(x1p, train)
        x2p = self.pack2(x2)
        x3 = self.conv3(x2p, train)
        x3p = self.pack3(x3)
        x4 = self.conv4(x3p, train)
        x4p = self.pack4(x4)
        x5 = self.conv5(x4p, train)
        x5p = self.pack5(x5)
        return x5p, [x, x1p, x2p, x3p, x4p]

    def decode(self, x5p, skips, train=True):
        skip1, skip2, skip3, skip4, skip5 = skips

        def merge(unpacked, skip):
            if self.version == 'A':
                return jnp.concatenate([unpacked, skip], axis=-1)
            return unpacked + skip

        unpack5 = self.unpack5(x5p)
        iconv5 = self.iconv5(merge(unpack5, skip5))
        unpack4 = self.unpack4(iconv5)
        iconv4 = self.iconv4(merge(unpack4, skip4))
        disp4 = self.disp4_layer(iconv4)
        udisp4 = upsample2x_nearest(disp4)

        unpack3 = self.unpack3(iconv4)
        iconv3 = self.iconv3(jnp.concatenate([merge(unpack3, skip3), udisp4], axis=-1))
        disp3 = self.disp3_layer(iconv3)
        udisp3 = upsample2x_nearest(disp3)

        unpack2 = self.unpack2(iconv3)
        iconv2 = self.iconv2(jnp.concatenate([merge(unpack2, skip2), udisp3], axis=-1))
        disp2 = self.disp2_layer(iconv2)
        udisp2 = upsample2x_nearest(disp2)

        unpack1 = self.unpack1(iconv2)
        iconv1 = self.iconv1(jnp.concatenate([merge(unpack1, skip1), udisp2], axis=-1))
        disp1 = self.disp1_layer(iconv1)

        return [disp1, disp2, disp3, disp4] if train else [disp1]


class PackNet01(nn.Module):
    """PackNet (reference: networks/depth/PackNet01.py)."""
    version: str = '1A'
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.core = _PackNetCore(version=self.version[1:], ni=64,
                                 channels=(64, 64, 128, 256, 512),
                                 num_3d_feat=8, dropout=self.dropout,
                                 dtype=self.dtype)

    def __call__(self, rgb, train=True, **kwargs):
        x5p, skips = self.core.encode(rgb, train)
        return {'inv_depths': self.core.decode(x5p, skips, train)}


class PackNetSlim01(nn.Module):
    """Slim PackNet (ni=32, n1=32, d=4) (reference: PackNetSlim01.py)."""
    version: str = '1A'
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.core = _PackNetCore(version=self.version[1:], ni=32,
                                 channels=(32, 64, 128, 256, 512),
                                 num_3d_feat=4, dropout=self.dropout,
                                 dtype=self.dtype)

    def __call__(self, rgb, train=True, **kwargs):
        x5p, skips = self.core.encode(rgb, train)
        return {'inv_depths': self.core.decode(x5p, skips, train)}


class _PackNetSANBase(nn.Module):
    """Shared SAN fusion wrapper over a PackNet core.

    Two fusion modes, matching the reference pair exactly:
    - plain (use_film=False): 5-scale additive fusion over the packed skips
      `skip * w_i + san + b_i` (PackNetSAN01.py:202-206);
    - FiLM (use_film=True): 6-scale fusion including the full-res pre_calc
      skip, where each film scale modulates the RGB skip with
      pooled-depth-conditioned (gamma, beta) and blends
      `w_i * (gamma*skip + beta) + (1-w_i) * san + b_i`; the sparse branch
      only descends through the film scales and its features upsample
      2x-nearest to the skip resolution (PackNetSlimSAN01.py:90-196)."""
    version: str = '1A'
    dropout: float = 0.0
    ni: int = 32
    channels: Sequence[int] = (32, 64, 128, 256, 512)
    num_3d_feat: int = 4
    use_film: bool = False
    film_scales: Sequence[int] = (0, 1)  # must be a contiguous prefix 0..k
    # active-row crop of the SAN branch (see layers/san.py); 0 = off
    san_row_window: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.core = _PackNetCore(version=self.version[1:], ni=self.ni,
                                 channels=self.channels,
                                 num_3d_feat=self.num_3d_feat,
                                 dropout=self.dropout, dtype=self.dtype)
        if self.use_film:
            # the sparse stages chain sequentially, so the modulated scales
            # must be a contiguous prefix (same constraint as the
            # reference's stage counter, PackNetSlimSAN01.py:150-156)
            assert tuple(self.film_scales) == tuple(
                range(len(self.film_scales))), \
                'film_scales must be a contiguous prefix 0..k, got {}'.format(
                    self.film_scales)
            feat_ch = (self.ni,) + tuple(self.channels)
            self.mconvs = MinkowskiEncoder(
                channels=feat_ch,
                rgb_channels=tuple(
                    c if i in tuple(self.film_scales) else 0
                    for i, c in enumerate(feat_ch)),
                dtype=self.dtype)
            n_gates = len(feat_ch)
            gate_init = 0.5
        else:
            self.mconvs = MinkowskiEncoder(channels=tuple(self.channels),
                                           dtype=self.dtype)
            n_gates, gate_init = 5, 1.0
        self.weight = self.param(
            'weight', lambda k: jnp.full((n_gates,), gate_init))
        self.bias = self.param('bias', lambda k: jnp.zeros((n_gates,)))

    def _crop_state(self, mask):
        H = mask.shape[1]
        Hw = (int(H * self.san_row_window) // 32 * 32
              if self.san_row_window > 0 else 0)
        crop = 0 < Hw < H and H % 32 == 0
        if not crop:
            return False, None, Hw
        s, dropped = active_row_window(mask, Hw)
        self.sow('intermediates', 'san_dropped', dropped)
        return True, s, Hw

    def run_network(self, rgb, input_depth=None, train=True):
        x5p, skips = self.core.encode(rgb, train)
        if input_depth is not None and self.use_film:
            d, mask = sparsify_depth(input_depth)
            crop, s, Hw = self._crop_state(mask)
            if crop:
                d = crop_rows(d, s, Hw)
                mask = crop_rows(mask, s, Hw)
            fused = []
            stage = 0  # sparse stages advance only through film scales
            for i, feat in enumerate(skips + [x5p]):
                if i not in tuple(self.film_scales):
                    fused.append(feat)
                    continue
                lvl_h = max(feat.shape[1] // 2, 1)  # sparse res = skip/2
                denom = float(lvl_h * max(feat.shape[2] // 2, 1)) \
                    if crop else None
                d, mask, gamma, beta = self.mconvs(
                    stage, d, mask, train, pool_denom=denom)
                sp = (paste_rows(d, s // (2 ** (stage + 1)), lvl_h)
                      if crop else d)
                sp = upsample2x_nearest(sp)
                if sp.shape[1:3] != feat.shape[1:3]:
                    sp = sp[:, :feat.shape[1], :feat.shape[2]]
                stage += 1
                modulated = gamma * feat + beta
                w = self.weight[i]
                fused.append(w * modulated + (1.0 - w) * sp + self.bias[i])
            skips, x5p = fused[:5], fused[5]
        elif input_depth is not None:
            d, mask = sparsify_depth(input_depth)
            crop, s, Hw = self._crop_state(mask)
            if crop:
                d = crop_rows(d, s, Hw)
                mask = crop_rows(mask, s, Hw)
            fused = [skips[0]]
            for i, feat in enumerate(skips[1:] + [x5p]):
                d, mask = self.mconvs(i, d, mask, train)[:2]
                sp = (paste_rows(d, s // (2 ** (i + 1)), feat.shape[1])
                      if crop else d)
                fused.append(feat * self.weight[i] + sp + self.bias[i])
            skips, x5p = fused[:5], fused[5]
        inv_depths = self.core.decode(x5p, skips, train)
        # consistency-loss features: slim-FiLM covers all 6 skips
        # (PackNetSlimSAN01.py:250), the plain variant the 5 fused ones
        feats = (skips + [x5p]) if self.use_film else (skips[1:] + [x5p])
        return inv_depths, feats

    def __call__(self, rgb, input_depth=None, train=True, **kwargs):
        if not train:
            inv_depths, _ = self.run_network(rgb, input_depth, train=False)
            return {'inv_depths': inv_depths}
        out_rgb, skip_rgb = self.run_network(rgb, None, train=True)
        output = {'inv_depths': out_rgb}
        if input_depth is None:
            return output
        out_rgbd, skip_rgbd = self.run_network(rgb, input_depth, train=True)
        output['inv_depths_rgbd'] = out_rgbd
        depth_loss = sum(
            jnp.mean((jax.lax.stop_gradient(sd.astype(jnp.float32))
                      - s.astype(jnp.float32)) ** 2)
            for sd, s in zip(skip_rgbd, skip_rgb)) / len(skip_rgbd)
        output['depth_loss'] = depth_loss
        return output


class PackNetSAN01(_PackNetSANBase):
    """PackNet-SAN (arXiv 2103.16690) (reference: PackNetSAN01.py:143-235)."""
    pass


class PackNetSlimSAN01(_PackNetSANBase):
    """Slim PackNet-SAN with depth-aware FiLM on by default
    (reference: PackNetSlimSAN01.py:16 — use_film=True, film_scales=[0,1])."""
    use_film: bool = True
