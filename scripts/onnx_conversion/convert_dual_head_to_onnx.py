"""Dual-head ResNetSAN01 deployment export (NPU flow).

Loads a framework checkpoint, mirrors the dual-head depth net to torch, and
exports either the composed-depth graph (default) or the two-sigmoid graph
the NPU toolchain consumes (`--separate_outputs`: integer_sigmoid +
fractional_sigmoid, composition done on-device by the runtime). Output
filename defaults to the reference's template
`dual_head_{ckpt}_{W}x{H}_{composed|separate}_{static|dynamic}.onnx`
(reference: scripts/onnx_conversion/convert_dual_head_to_onnx.py:106-140).
When the `onnx` package is absent a TorchScript trace is produced instead
(same fallback as scripts/convert_to_onnx.py).

Usage:
    python scripts/onnx_conversion/convert_dual_head_to_onnx.py
        --checkpoint m.ckpt [--output out.onnx] [--input_shape 384 640]
        [--separate_outputs] [--dynamic_axes] [--max_depth 15.0]
        [--opset_version 13]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()  # offline host tool: never contend for the TPU tunnel


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--output', default=None)
    p.add_argument('--input_shape', type=int, nargs=2, default=[384, 640],
                   help='H W')
    p.add_argument('--opset_version', type=int, default=13)
    p.add_argument('--separate_outputs', action='store_true',
                   help='export integer_sigmoid + fractional_sigmoid '
                        '(NPU flow) instead of composed depth')
    p.add_argument('--dynamic_axes', action='store_true',
                   help='dynamic batch dim (default static, NPU-friendly)')
    p.add_argument('--max_depth', type=float, default=None,
                   help='override config max_depth for composition')
    return p.parse_args(argv)


def default_output(ckpt, H, W, separate, dynamic):
    base = os.path.basename(ckpt).rsplit('.', 1)[0]
    return 'onnx/dual_head_{}_{}x{}_{}_{}.onnx'.format(
        base, W, H, 'separate' if separate else 'composed',
        'dynamic' if dynamic else 'static')


def build_torch_dual_head(checkpoint, max_depth_override=None):
    """Framework ckpt -> (torch mirror net, max_depth). Fails loud when the
    checkpoint is not dual-head (the reference prompts interactively; a
    deploy tool should not)."""
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.export.torch_mirror import load_resnet_san_into_torch

    config, state = parse_test_file(checkpoint)
    dn_cfg = config.model.depth_net
    if not dn_cfg.get('use_dual_head', False):
        raise SystemExit('checkpoint is not a dual-head model '
                         '(model.depth_net.use_dual_head is false)')
    variables = {
        'params': jax.tree_util.tree_map(
            jnp.asarray, state['params']['depth_net']),
        'batch_stats': jax.tree_util.tree_map(
            jnp.asarray, state['batch_stats'].get('depth_net', {})),
    }
    max_depth = (max_depth_override if max_depth_override is not None
                 else config.model.params.get('max_depth', 15.0))
    net = load_resnet_san_into_torch(
        variables, num_layers=int((dn_cfg.version or '18A')[:2]),
        dual_head=True, min_depth=config.model.params.min_depth or 0.5,
        max_depth=max_depth)
    return net, float(max_depth)


class TwoSigmoidWrapper:
    """Factory for the separate-outputs torch graph."""

    def __new__(cls, net):
        import torch

        class _Wrap(torch.nn.Module):
            def __init__(self, inner):
                super().__init__()
                self.encoder = inner.encoder
                self.decoder = inner.decoder

            def forward(self, rgb):
                integer, frac = self.decoder(self.encoder(rgb))
                return integer, frac

        return _Wrap(net)


def export(net, out_path, H, W, separate, opset, dynamic):
    import torch
    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    dummy = torch.zeros(1, 3, H, W)
    names = (['integer_sigmoid', 'fractional_sigmoid'] if separate
             else ['depth'])
    dyn = ({'rgb': {0: 'batch'}, **{n: {0: 'batch'} for n in names}}
           if dynamic else None)
    try:
        torch.onnx.export(net, dummy, out_path, opset_version=opset,
                          input_names=['rgb'], output_names=names,
                          dynamic_axes=dyn, do_constant_folding=True)
        return out_path
    except (ModuleNotFoundError, ImportError) as e:
        ts_path = out_path.rsplit('.', 1)[0] + '.torchscript.pt'
        torch.jit.trace(net, dummy).save(ts_path)
        print('[export] onnx unavailable ({}); saved TorchScript to {}'
              .format(e, ts_path))
        return ts_path


def main(argv=None):
    import torch
    args = parse_args(argv)
    H, W = args.input_shape
    out_path = args.output or default_output(
        args.checkpoint, H, W, args.separate_outputs, args.dynamic_axes)

    net, max_depth = build_torch_dual_head(args.checkpoint, args.max_depth)
    graph = TwoSigmoidWrapper(net) if args.separate_outputs else net
    graph.eval()

    # sanity forward: sigmoids in [0,1], composed depth within range
    with torch.no_grad():
        dummy = torch.rand(1, 3, H, W)
        if args.separate_outputs:
            integer, frac = graph(dummy)
            depth = integer * max_depth + frac
            print('integer range [{:.3f}, {:.3f}], fractional '
                  '[{:.3f}, {:.3f}]'.format(integer.min(), integer.max(),
                                            frac.min(), frac.max()))
        else:
            depth = graph(dummy)
        print('composed depth range [{:.3f}, {:.3f}] m (max_depth {})'
              .format(depth.min(), depth.max(), max_depth))

    written = export(graph, out_path, H, W, args.separate_outputs,
                     args.opset_version, args.dynamic_axes)
    print('exported {} ({:.1f} MB)'.format(
        written, os.path.getsize(written) / 1e6))


if __name__ == '__main__':
    main()
