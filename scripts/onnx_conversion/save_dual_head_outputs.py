"""Save per-sample integer / fractional / composed dual-head outputs.

Runs a dual-head checkpoint over one of its configured dataset splits with
a single jitted forward and writes each sample's integer sigmoid,
fractional sigmoid, and composed depth for NPU cross-validation
(reference: scripts/onnx_conversion/save_dual_head_outputs.py:30-200 —
npz-per-sample or npy-per-tensor formats, and the `--save_separate_dirs`
layout `integer_{precision}/` + `fractional_{precision}/` keyed by model
name that the ST2 validation tooling consumes).

Usage:
    python scripts/onnx_conversion/save_dual_head_outputs.py
        --checkpoint m.ckpt --output_dir out/ [--split test]
        [--num_samples N] [--save_format npz|npy] [--save_separate_dirs]
        [--precision fp32|int8] [--model_name name]
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
    p.add_argument('--output_dir', default='outputs/dual_head_outputs_npy')
    p.add_argument('--split', default='test',
                   choices=['train', 'validation', 'val', 'test'])
    p.add_argument('--num_samples', type=int, default=None)
    p.add_argument('--save_format', default='npz', choices=['npy', 'npz'])
    p.add_argument('--save_separate_dirs', action='store_true')
    p.add_argument('--precision', default='fp32', choices=['fp32', 'int8'])
    p.add_argument('--model_name', default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.datasets import setup_dataset
    from packnet_sfm_tpu.models.factory import setup_depth_net
    from packnet_sfm_tpu.ops.depth import dual_head_to_depth
    from packnet_sfm_tpu.ops.quantization import fake_quant_u8

    config, state = parse_test_file(args.checkpoint)
    dn_cfg = config.model.depth_net
    if not dn_cfg.get('use_dual_head', False):
        raise SystemExit('checkpoint is not a dual-head model')
    max_depth = float(config.model.params.get('max_depth', 15.0))

    split = 'validation' if args.split == 'val' else args.split
    datasets = setup_dataset(config.datasets[split],
                             config.datasets.augmentation, split)
    if not datasets:
        raise SystemExit('checkpoint config has no {} dataset'.format(split))
    ds = datasets[0]

    net = setup_depth_net(dn_cfg, config.model.params)
    variables = {
        'params': jax.tree_util.tree_map(
            jnp.asarray, state['params']['depth_net']),
        'batch_stats': jax.tree_util.tree_map(
            jnp.asarray, state['batch_stats'].get('depth_net', {}))}

    @jax.jit
    def forward(rgb):
        out = net.apply(variables, rgb=rgb, train=False)
        return out[('integer', 0)], out[('fractional', 0)]

    model_name = args.model_name or os.path.basename(
        args.checkpoint).rsplit('.', 1)[0]
    out_root = args.output_dir
    if args.save_separate_dirs:
        dirs = {
            'integer': os.path.join(out_root, model_name,
                                    'integer_' + args.precision),
            'fractional': os.path.join(out_root, model_name,
                                       'fractional_' + args.precision),
            'depth': os.path.join(out_root, model_name,
                                  'depth_' + args.precision),
        }
    else:
        dirs = {k: out_root for k in ('integer', 'fractional', 'depth')}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    n = len(ds) if args.num_samples is None else min(args.num_samples,
                                                     len(ds))
    for i in range(n):
        s = ds[i]
        integer, frac = forward(jnp.asarray(s['rgb'][None]))
        integer = np.asarray(integer)[0, ..., 0]
        frac = np.asarray(frac)[0, ..., 0]
        if args.precision == 'int8':
            # measured INT8 output story: fake-quantize the sigmoids the
            # way the NPU output path does (ops/quantization.py)
            integer = np.asarray(fake_quant_u8(jnp.asarray(integer)))
            frac = np.asarray(fake_quant_u8(jnp.asarray(frac)))
        depth = np.asarray(dual_head_to_depth(
            jnp.asarray(integer), jnp.asarray(frac), max_depth))
        stem = s.get('filename', '{:06d}'.format(i))
        if args.save_format == 'npz':
            np.savez(os.path.join(dirs['integer'], stem + '.npz'),
                     integer=integer, fractional=frac, depth=depth,
                     max_depth=max_depth)
        else:
            np.save(os.path.join(dirs['integer'], stem + '_integer.npy'),
                    integer)
            np.save(os.path.join(dirs['fractional'],
                                 stem + '_fractional.npy'), frac)
            np.save(os.path.join(dirs['depth'], stem + '_depth.npy'), depth)
        if i % 25 == 0:
            print('{}/{}'.format(i, n))
    print('saved {} samples to {}'.format(n, out_root))


if __name__ == '__main__':
    main()
