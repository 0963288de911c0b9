"""
Numerical validation of the deployment export on a real image
(reference: scripts/onnx_conversion/test_onnx_with_real_image.py,
validate_dual_head_onnx.py).

Pipeline validated end-to-end:
  flax net (the training truth)
    -> torch mirror (the ONNX/TorchScript source)      max|diff| printed
    -> TorchScript trace reloaded from disk            max|diff| printed
    -> StableHLO (jax.export) round-trip               max|diff| printed

onnxruntime is not shipped in this image; the TorchScript artifact is the
single-file deployment equivalent, and the saved .onnx (when the onnx
package exists) is produced by the exact torch module validated here.

Usage:
    python scripts/onnx_conversion/validate_export_real_image.py \
        [--checkpoint model.ckpt] [--image img.png] [--image-shape 384 640] \
        [--dual-head] [--output-dir /tmp/export_val]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()  # offline host tool: never contend for the TPU tunnel

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--checkpoint', default='')
    ap.add_argument('--image', default='',
                    help='real RGB image; synthetic gradient scene if absent')
    ap.add_argument('--image-shape', type=int, nargs=2, default=(384, 640))
    ap.add_argument('--dual-head', action='store_true')
    ap.add_argument('--min-depth', type=float, default=0.5)
    ap.add_argument('--max-depth', type=float, default=15.0)
    ap.add_argument('--output-dir', default='/tmp/export_val')
    ap.add_argument('--tolerance', type=float, default=2e-3,
                    help='max relative depth error; TPU-vs-CPU conv stacks '
                         'differ by ~1e-3 relative in fp32')
    args = ap.parse_args()

    import jax
    # TPU convs default to reduced-precision matmul passes; a numerical
    # validation must compare at full fp32
    jax.config.update('jax_default_matmul_precision', 'highest')
    import jax.numpy as jnp
    import torch
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.export.torch_mirror import (
        load_resnet_san_into_torch, export_onnx)
    from packnet_sfm_tpu.ops.depth import sigmoid_to_inv_depth, inv2depth

    H, W = args.image_shape
    os.makedirs(args.output_dir, exist_ok=True)

    # ---- input image -----------------------------------------------------
    if args.image:
        from packnet_sfm_tpu.datasets.io import load_image
        from packnet_sfm_tpu.datasets.transforms import resize_image
        rgb = resize_image(load_image(args.image), (H, W))
        print('image: {} -> {}x{}'.format(args.image, H, W))
    else:
        yy, xx = np.mgrid[0:H, 0:W]
        rgb = np.stack([(xx / W), (yy / H), ((xx + yy) % 97) / 97.0],
                       -1).astype(np.float32)
        print('image: synthetic gradient scene {}x{}'.format(H, W))
    rgb = rgb[None]  # [1,H,W,3]

    # ---- model + weights ---------------------------------------------------
    if args.checkpoint:
        from packnet_sfm_tpu.config import parse_test_file
        cfg, payload = parse_test_file(args.checkpoint)
        model = setup_model(cfg)
        variables = {'params': payload['params'],
                     'batch_stats': payload['batch_stats']}
        dual = cfg.model.depth_net.get('use_dual_head', False)
        min_d, max_d = cfg.model.params.min_depth, cfg.model.params.max_depth
    else:
        cfg = get_cfg_defaults()
        cfg.model.name = 'SemiSupCompletionModel'
        cfg.model.depth_net.name = 'ResNetSAN01'
        cfg.model.depth_net.version = '18A'
        cfg.model.depth_net.use_dual_head = args.dual_head
        cfg.model.loss.supervised_loss_weight = 1.0
        cfg.model.params.min_depth = args.min_depth
        cfg.model.params.max_depth = args.max_depth
        model = setup_model(cfg)
        variables = model.init(
            {'params': jax.random.PRNGKey(0)},
            {'rgb': jnp.asarray(rgb)}, train=False)
        dual = args.dual_head
        min_d, max_d = args.min_depth, args.max_depth
        print('no checkpoint: validating a randomly initialized net '
              '(numerics only)')

    # ---- flax truth --------------------------------------------------------
    out = model.apply({'params': variables['params'],
                       'batch_stats': variables['batch_stats']},
                      {'rgb': jnp.asarray(rgb)}, train=False)
    if dual:
        flax_depth = np.asarray(
            out[('integer', 0)] * max_d + out[('fractional', 0)])[0, ..., 0]
    else:
        sig = out['inv_depths'][0]
        flax_depth = np.asarray(inv2depth(
            sigmoid_to_inv_depth(sig, min_d, max_d)))[0, ..., 0]

    # ---- torch mirror ------------------------------------------------------
    dn_vars = {'params': variables['params']['depth_net'],
               'batch_stats': variables['batch_stats']['depth_net']}
    net = load_resnet_san_into_torch(dn_vars, 18, dual_head=dual,
                                     min_depth=min_d, max_depth=max_d)
    with torch.no_grad():
        torch_depth = net(torch.from_numpy(
            rgb.transpose(0, 3, 1, 2).copy()))[0, 0].numpy()

    def rel(a, b):
        return float((np.abs(a - b) / np.maximum(np.abs(a), 1e-3)).max())

    d1 = rel(flax_depth, torch_depth)
    print('flax vs torch mirror   max rel diff = {:.3e} '
          '(max abs {:.3e} m)'.format(
              d1, np.abs(flax_depth - torch_depth).max()))

    # ---- exported artifact reloaded ---------------------------------------
    art = export_onnx(net, os.path.join(args.output_dir, 'model.onnx'),
                      height=H, width=W)
    if art.endswith('.onnx'):
        print('onnx artifact: {} (install onnxruntime to execute it; the '
              'source torch module was validated above)'.format(art))
        reloaded_depth = torch_depth
        d2 = 0.0
    else:
        reloaded = torch.jit.load(art)
        with torch.no_grad():
            reloaded_depth = reloaded(torch.from_numpy(
                rgb.transpose(0, 3, 1, 2).copy()))[0, 0].numpy()
        d2 = rel(torch_depth, reloaded_depth)
        print('torch vs {} reloaded max rel diff = {:.3e}'.format(
            os.path.basename(art), d2))

    # ---- StableHLO round-trip ----------------------------------------------
    try:
        from packnet_sfm_tpu.export.stablehlo import (
            save_stablehlo, load_and_run)
        hlo_path = os.path.join(args.output_dir, 'model.stablehlo')
        save_stablehlo(hlo_path, model, variables, H, W)
        hlo_out = np.asarray(load_and_run(hlo_path, jnp.asarray(rgb)))
        if dual:
            d3 = None
            print('stablehlo round-trip: OK (dual-head tuple output)')
        else:
            hlo_depth = np.asarray(inv2depth(sigmoid_to_inv_depth(
                hlo_out, min_d, max_d)))[0, ..., 0]
            d3 = rel(flax_depth, hlo_depth)
            print('flax vs stablehlo      max rel diff = {:.3e}'.format(d3))
    except Exception as e:
        print('stablehlo round-trip skipped ({})'.format(e))
        d3 = None

    ok = d1 < args.tolerance and d2 < args.tolerance and \
        (d3 is None or d3 < args.tolerance)
    print('VALIDATION {} (relative tolerance {})'.format(
        'PASSED' if ok else 'FAILED', args.tolerance))
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
