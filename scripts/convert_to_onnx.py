"""
Deployment conversion CLI (reference: scripts/onnx_conversion/convert_to_onnx.py).

Exports the RGB-only depth wrapper from a framework checkpoint:
- ONNX via the torch mirror (TorchScript fallback when onnx is absent)
- StableHLO via jax.export (TPU/portable path)

Usage:
    python scripts/convert_to_onnx.py --checkpoint m.ckpt --output out.onnx
                                      [--image_shape 384 640] [--opset 13]
                                      [--stablehlo out.stablehlo]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--output', required=True)
    p.add_argument('--image_shape', type=int, nargs=2, default=[384, 640],
                   help='H W (reference default 352x1216 for KITTI-SAN, '
                        '384x640 for NCDB)')
    p.add_argument('--opset', type=int, default=13)
    p.add_argument('--stablehlo', type=str, default=None,
                   help='also export a StableHLO artifact to this path')
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.models.factory import setup_depth_net

    config, state = parse_test_file(args.checkpoint)
    params_cfg = config.model.params
    dn_cfg = config.model.depth_net
    variables = {
        'params': jax.tree_util.tree_map(
            jnp.asarray, state['params']['depth_net']),
        'batch_stats': jax.tree_util.tree_map(
            jnp.asarray, state['batch_stats'].get('depth_net', {})),
    }

    H, W = args.image_shape
    if dn_cfg.name == 'ResNetSAN01':
        from packnet_sfm_tpu.export.torch_mirror import (
            load_resnet_san_into_torch, export_onnx)
        num_layers = int((dn_cfg.version or '18A')[:2])
        tnet = load_resnet_san_into_torch(
            variables, num_layers=num_layers,
            dual_head=dn_cfg.get('use_dual_head', False),
            min_depth=params_cfg.min_depth or 0.5,
            max_depth=params_cfg.max_depth or 80.0,
            use_log_space=params_cfg.use_log_space)
        out = export_onnx(tnet, args.output, H, W, args.opset)
        print('exported', out)
    else:
        print('torch-mirror export currently covers ResNetSAN01; '
              'use --stablehlo for other nets')

    if args.stablehlo:
        from packnet_sfm_tpu.export.stablehlo import save_stablehlo
        net = setup_depth_net(dn_cfg, params_cfg)
        save_stablehlo(args.stablehlo, net, variables, H, W)
        print('exported', args.stablehlo)


if __name__ == '__main__':
    main()
