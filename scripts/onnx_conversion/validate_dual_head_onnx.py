"""Validate a dual-head deployment export against the framework forward.

Runs N random inputs through (a) the jitted jax dual-head depth net from
the checkpoint and (b) the exported artifact — an ONNX file via
onnxruntime when available, otherwise the TorchScript trace or a freshly
built torch mirror — and reports max abs errors for the integer sigmoid,
fractional sigmoid, and composed depth (reference:
scripts/onnx_conversion/validate_dual_head_onnx.py:46-140; pass bar 1e-4
on sigmoids).

Usage:
    python scripts/onnx_conversion/validate_dual_head_onnx.py
        --checkpoint m.ckpt [--artifact dual_head.onnx|.torchscript.pt]
        [--num_samples 5] [--input_shape 384 640] [--tolerance 1e-4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()  # offline host tool: never contend for the TPU tunnel


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--artifact', default=None,
                   help='exported .onnx / .torchscript.pt; default: build '
                        'the torch mirror in-process')
    p.add_argument('--num_samples', type=int, default=5)
    p.add_argument('--input_shape', type=int, nargs=2, default=[384, 640])
    p.add_argument('--tolerance', type=float, default=1e-4)
    return p.parse_args(argv)


def jax_forward_fn(checkpoint):
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.models.factory import setup_depth_net

    config, state = parse_test_file(checkpoint)
    dn_cfg = config.model.depth_net
    if not dn_cfg.get('use_dual_head', False):
        raise SystemExit('checkpoint is not a dual-head model')
    net = setup_depth_net(dn_cfg, config.model.params)
    variables = {
        'params': jax.tree_util.tree_map(
            jnp.asarray, state['params']['depth_net']),
        'batch_stats': jax.tree_util.tree_map(
            jnp.asarray, state['batch_stats'].get('depth_net', {}))}

    @jax.jit
    def fwd(rgb):
        out = net.apply(variables, rgb=rgb, train=False)
        return out[('integer', 0)], out[('fractional', 0)]

    max_depth = float(config.model.params.get('max_depth', 15.0))
    return fwd, max_depth


def artifact_forward_fn(artifact, checkpoint, max_depth):
    """Returns fn(rgb_nchw) -> (integer, fractional) as numpy NCHW."""
    import torch

    if artifact and artifact.endswith('.onnx') and os.path.exists(artifact):
        try:
            import onnxruntime as ort
            sess = ort.InferenceSession(artifact)
            names = [o.name for o in sess.get_outputs()]

            def fwd(rgb):
                outs = sess.run(None, {'rgb': rgb})
                if len(outs) == 1:  # composed-only graph: cannot split
                    raise SystemExit(
                        'composed-only export; validate with '
                        '--separate_outputs artifacts')
                return outs[0], outs[1]
            print('artifact backend: onnxruntime ({})'.format(names))
            return fwd
        except ImportError:
            print('onnxruntime unavailable; falling back to torch mirror')

    if artifact and artifact.endswith('.pt') and os.path.exists(artifact):
        traced = torch.jit.load(artifact)

        def fwd(rgb):
            with torch.no_grad():
                out = traced(torch.from_numpy(rgb))
            if isinstance(out, (tuple, list)) and len(out) == 2:
                return out[0].numpy(), out[1].numpy()
            raise SystemExit('artifact is a composed-only trace; export '
                             'with --separate_outputs to validate heads')
        print('artifact backend: torchscript')
        return fwd

    # in-process mirror (same weights path the export used)
    from convert_dual_head_to_onnx import (
        build_torch_dual_head, TwoSigmoidWrapper)
    net, _ = build_torch_dual_head(checkpoint, max_depth)
    wrap = TwoSigmoidWrapper(net)
    wrap.eval()

    def fwd(rgb):
        with torch.no_grad():
            integer, frac = wrap(torch.from_numpy(rgb))
        return integer.numpy(), frac.numpy()
    print('artifact backend: in-process torch mirror')
    return fwd


def main(argv=None):
    args = parse_args(argv)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    H, W = args.input_shape

    jfwd, max_depth = jax_forward_fn(args.checkpoint)
    afwd = artifact_forward_fn(args.artifact, args.checkpoint, max_depth)

    rng = np.random.RandomState(0)
    worst = {'integer': 0.0, 'fractional': 0.0, 'depth': 0.0}
    for i in range(args.num_samples):
        rgb = rng.rand(1, 3, H, W).astype(np.float32)
        ji, jf = jfwd(np.transpose(rgb, (0, 2, 3, 1)))  # jax is NHWC
        ji = np.transpose(np.asarray(ji), (0, 3, 1, 2))
        jf = np.transpose(np.asarray(jf), (0, 3, 1, 2))
        ai, af = afwd(rgb)
        di = float(np.abs(ji - ai).max())
        df = float(np.abs(jf - af).max())
        dd = float(np.abs((ji * max_depth + jf) -
                          (ai * max_depth + af)).max())
        worst = {k: max(worst[k], v) for k, v in
                 zip(worst, (di, df, dd))}
        print('sample {}: integer {:.2e}  fractional {:.2e}  '
              'depth {:.2e} m'.format(i, di, df, dd))

    print('max errors: integer {:.2e}  fractional {:.2e}  depth {:.2e} m'
          .format(worst['integer'], worst['fractional'], worst['depth']))
    ok = (worst['integer'] <= args.tolerance
          and worst['fractional'] <= args.tolerance)
    print('PASS' if ok else 'FAIL')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
