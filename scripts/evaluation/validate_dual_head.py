"""
Dual-head output verification
(reference: scripts/evaluation/verify_dual_head_output.py — SURVEY.md §2.14):
run a dual-head checkpoint on sample images and verify the integer/fractional
recomposition stays consistent (recomposed depth within [0, max_depth+1],
fractional in [0,1], quantization-step analysis).

Usage:
    python scripts/evaluation/validate_dual_head.py --checkpoint m.ckpt
        --input images_dir [--image_shape 384 640]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from packnet_sfm_tpu.utils.hostjax import force_cpu
force_cpu()  # offline host tool: never contend for the TPU tunnel

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--input', required=True)
    p.add_argument('--image_shape', type=int, nargs=2, default=[384, 640])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.datasets.io import load_image
    from packnet_sfm_tpu.datasets.transforms import resize_image
    from packnet_sfm_tpu.ops.depth import dual_head_to_depth

    config, state = parse_test_file(args.checkpoint)
    assert config.model.depth_net.use_dual_head, \
        'Checkpoint is not a dual-head model'
    max_depth = config.model.params.max_depth
    model = setup_model(config)
    variables = {
        'params': jax.tree_util.tree_map(jnp.asarray, state['params']),
        'batch_stats': jax.tree_util.tree_map(jnp.asarray,
                                              state['batch_stats'])}

    @jax.jit
    def forward(rgb):
        return model.apply(variables, {'rgb': rgb}, train=False)

    files = sorted(os.path.join(args.input, f)
                   for f in os.listdir(args.input)
                   if f.lower().endswith(('.png', '.jpg')))
    print('Integer quantization step: {:.2f} mm; fractional: {:.2f} mm'
          .format(max_depth / 255 * 1000, 1.0 / 255 * 1000))
    ok = True
    for f in files[:16]:
        rgb = resize_image(load_image(f), tuple(args.image_shape))
        out = forward(jnp.asarray(rgb[None]))
        integer = np.asarray(out[('integer', 0)])
        frac = np.asarray(out[('fractional', 0)])
        depth = np.asarray(dual_head_to_depth(
            jnp.asarray(integer), jnp.asarray(frac), max_depth))
        checks = {
            'integer in [0,1]': 0 <= integer.min() and integer.max() <= 1,
            'fractional in [0,1]': 0 <= frac.min() and frac.max() <= 1,
            'depth in range': 0 <= depth.min() and
            depth.max() <= max_depth + 1.0,
        }
        ok &= all(checks.values())
        print('{}: depth [{:.2f}, {:.2f}] m {}'.format(
            os.path.basename(f), depth.min(), depth.max(),
            'OK' if all(checks.values()) else 'FAIL ' + str(checks)))
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
