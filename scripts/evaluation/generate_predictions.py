"""
Generate per-sample depth predictions from a checkpoint over a split or an
image directory — the single-tool counterpart of the reference's
prediction-dump family (scripts/evaluation/generate_predictions_from_split.py,
generate_pytorch_predictions.py, generate_fp32_dual_head_predictions.py,
scripts/visualization/generate_fp32_predictions.py — SURVEY.md §2.14).

Outputs per sample:
    <out>/<stem>.npz             composed depth (key 'depth')
    <out>/<stem>.png             16-bit depth*256 (with --save png)
    <out>/<stem>_integer.npy     dual-head integer sigmoid (dual-head ckpts)
    <out>/<stem>_fractional.npy  dual-head fractional sigmoid

Split format: JSON list of stems / {new_filename} / {image_path} entries
(NCDB shapes) or .txt stem-per-line (KITTI); stems resolve under --images.

Usage:
    python scripts/evaluation/generate_predictions.py --checkpoint m.ckpt \
        --split split.json --images /data/rgb --output preds \
        [--image_shape 384 640] [--save npz png]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np


def resolve_split(split, images_root):
    """Split entries -> list of image paths (missing reported, skipped)."""
    if split.endswith('.json'):
        with open(split) as f:
            entries = json.load(f)
        stems = []
        for e in entries:
            if isinstance(e, str):
                stems.append(e)
            elif 'image_path' in e:
                stems.append(e['image_path'])
            elif 'new_filename' in e:
                stems.append(e['new_filename'])
    else:
        with open(split) as f:
            stems = [ln.split()[0] for ln in f if ln.strip()]
    out, missing = [], 0
    for s in stems:
        cands = [s] if os.path.isabs(s) else [
            os.path.join(images_root, s),
            os.path.join(images_root, s + '.png'),
            os.path.join(images_root, s + '.jpg'),
            os.path.join(images_root, os.path.basename(s)),
            os.path.join(images_root, os.path.basename(s) + '.png'),
        ]
        for c in cands:
            if os.path.isfile(c):
                out.append(c)
                break
        else:
            missing += 1
    if missing:
        print('WARNING: {} split entries not found under {}'.format(
            missing, images_root), file=sys.stderr)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--split', default=None,
                   help='json/txt split; omit to glob --images directly')
    p.add_argument('--images', required=True)
    p.add_argument('--output', required=True)
    p.add_argument('--image_shape', type=int, nargs=2, default=None)
    p.add_argument('--save', nargs='+', default=['npz'],
                   choices=['npz', 'png'])
    p.add_argument('--limit', type=int, default=0)
    p.add_argument('--device', default='cpu', choices=['cpu', 'default'],
                   help="offline dumps default to host CPU (the axon "
                        "sitecustomize overrides JAX_PLATFORMS, so without "
                        "this the tool blocks on the TPU tunnel); pass "
                        "'default' to run big dump jobs on the chip")
    args = p.parse_args()

    if args.device == 'cpu':
        from packnet_sfm_tpu.utils.hostjax import force_cpu
        force_cpu()
    import jax
    import jax.numpy as jnp
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.datasets.io import load_image, write_depth
    from packnet_sfm_tpu.datasets.transforms import resize_image
    from packnet_sfm_tpu.ops.depth import (
        sigmoid_to_inv_depth, inv2depth, dual_head_to_depth)

    config, state = parse_test_file(args.checkpoint)
    model = setup_model(config)
    params = jax.tree_util.tree_map(jnp.asarray, state['params'])
    batch_stats = jax.tree_util.tree_map(jnp.asarray, state['batch_stats'])
    dual = bool(config.model.depth_net.get('use_dual_head', False))
    pc = config.model.params
    min_d, max_d = pc.min_depth or 0.5, pc.max_depth or 80.0

    if args.split:
        files = resolve_split(args.split, args.images)
    else:
        files = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if f.lower().endswith(('.png', '.jpg', '.jpeg')))
    if args.limit:
        files = files[:args.limit]
    os.makedirs(args.output, exist_ok=True)

    @jax.jit
    def forward(rgb):
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          {'rgb': rgb}, train=False)
        if dual:
            return out[('integer', 0)], out[('fractional', 0)]
        return out['inv_depths'][0]

    for f in files:
        rgb = load_image(f)
        if args.image_shape:
            rgb = resize_image(rgb, tuple(args.image_shape))
        stem = os.path.splitext(os.path.basename(f))[0]
        out = forward(jnp.asarray(rgb[None]))
        if dual:
            integer, frac = (np.asarray(o)[0] for o in out)
            depth = np.asarray(dual_head_to_depth(
                jnp.asarray(integer), jnp.asarray(frac), max_d))[..., 0]
            np.save(os.path.join(args.output, stem + '_integer.npy'),
                    integer)
            np.save(os.path.join(args.output, stem + '_fractional.npy'),
                    frac)
        else:
            sig = np.asarray(out)[0]
            inv = sigmoid_to_inv_depth(jnp.asarray(sig), min_d, max_d,
                                       pc.use_log_space)
            depth = np.asarray(inv2depth(inv))[..., 0]
        if 'npz' in args.save:
            write_depth(os.path.join(args.output, stem + '.npz'), depth)
        if 'png' in args.save:
            write_depth(os.path.join(args.output, stem + '.png'), depth)
        print('saved', stem)
    print('wrote {} predictions to {}'.format(len(files), args.output))


if __name__ == '__main__':
    main()
