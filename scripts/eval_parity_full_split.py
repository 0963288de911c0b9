"""
Full-split eval parity on an imported reference checkpoint (VERDICT r4 #6).

Scales the one-image metric-parity chain (tests/test_reference_ckpt.py,
tests/test_export.py) to a FULL split: a reference-format torch checkpoint
is ingested by scripts/import_reference_checkpoint.py, evaluated over a
>=100-sample split through scripts/eval.py's own test() machinery (loader,
jitted metric protocol, per-batch accumulation), and the SAME samples are
pushed through the independent torch mirror + a numpy implementation of
the reference's metric protocol (reference utils/depth.py:258-447,
utils/post_process_depth.py:13-169). Every one of the 7 metrics x 6
conversion modes must agree within 1e-3.

The chain proven: reference ckpt bytes -> weight import -> flax forward ->
sigmoid->depth (linear AND log space) -> masked metrics with and without
GT median scaling == torch forward -> numpy protocol. That is
"weights-in => numbers-out" at split scale, not single-image scale.

Usage:
    python scripts/eval_parity_full_split.py [--samples 128]
        [--out artifacts/eval_parity_full_split.json]

Runs on host CPU (fp32 parity; tpu.compute_dtype float32 is the
documented bit-exact knob — BENCH_NOTES round 4).
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'scripts'))

from packnet_sfm_tpu.utils.hostjax import force_cpu  # noqa: E402
force_cpu()

import numpy as np  # noqa: E402

METRIC_NAMES = ('abs_rel', 'sqr_rel', 'rmse', 'rmse_log', 'a1', 'a2', 'a3')
MIN_D, MAX_D = 0.5, 15.0


def np_metrics(gt, pred, use_gt_scale):
    """Reference metric protocol in numpy (utils/depth.py:258-447):
    per-image valid mask (min<gt<max), optional GT median scaling,
    per-image metric sums divided by batch size (empty masks contribute
    zero) — the same formulation golden-tested in tests/test_metrics.py."""
    B = gt.shape[0]
    totals = np.zeros(7)
    for i in range(B):
        g, p = gt[i, ..., 0], pred[i, ..., 0]
        valid = (g > MIN_D) & (g < MAX_D)
        if valid.sum() == 0:
            continue
        gi, pi = g[valid], p[valid]
        if use_gt_scale:
            pi = pi * (np.median(gi) / np.median(pi))
        thresh = np.maximum(gi / pi, pi / gi)
        totals += [
            np.mean(np.abs(gi - pi) / gi),
            np.mean((gi - pi) ** 2 / gi),
            np.sqrt(np.mean((gi - pi) ** 2)),
            np.sqrt(np.mean((np.log(gi) - np.log(pi)) ** 2)),
            (thresh < 1.25).mean(),
            (thresh < 1.25 ** 2).mean(),
            (thresh < 1.25 ** 3).mean(),
        ]
    return totals / B


def np_sigmoid_to_depth(sig, log_space):
    """reference utils/post_process_depth.py:13-169."""
    min_inv, max_inv = 1.0 / MAX_D, 1.0 / MIN_D
    if log_space:
        inv = np.exp(np.log(min_inv)
                     + (np.log(max_inv) - np.log(min_inv)) * sig)
    else:
        inv = min_inv + (max_inv - min_inv) * sig
    return 1.0 / (inv + 1e-8)


def build_cfg(samples):
    from packnet_sfm_tpu.config import get_cfg_defaults
    from packnet_sfm_tpu.config.config import prepare_config
    cfg = get_cfg_defaults().clone()
    cfg.model.name = 'SemiSupCompletionModel'
    cfg.model.depth_net.name = 'ResNetSAN01'
    cfg.model.depth_net.version = '18A'
    cfg.model.pose_net.name = ''
    cfg.model.loss.supervised_method = 'sparse-l1'
    cfg.model.loss.supervised_loss_weight = 1.0
    cfg.model.params.min_depth = MIN_D
    cfg.model.params.max_depth = MAX_D
    cfg.model.params.crop = ''
    cfg.model.params.scale_output = 'resize'
    cfg.tpu.compute_dtype = 'float32'   # bit-exact parity knob
    for split, n in (('train', '4'), ('validation', '4'),
                     ('test', str(samples))):
        d = getattr(cfg.datasets, split)
        d.dataset = ['Synthetic']
        d.path = ['']
        d.split = [n]
        d.batch_size = 4
        d.num_workers = 0
    cfg.prepared = False
    return prepare_config(cfg)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--samples', type=int, default=128)
    ap.add_argument('--out',
                    default='artifacts/eval_parity_full_split.json')
    ap.add_argument('--tol', type=float, default=1e-3)
    args = ap.parse_args(argv)

    import tempfile
    import torch
    import yaml
    import jax

    from packnet_sfm_tpu.models import setup_model
    from packnet_sfm_tpu.export.torch_import import (
        flax_to_reference_depth_net)
    from packnet_sfm_tpu.export.torch_mirror import (
        load_resnet_san_into_torch)
    from import_reference_checkpoint import convert, _dummy_batch

    cfg = build_cfg(args.samples)
    model = setup_model(cfg)
    variables = model.init({'params': jax.random.PRNGKey(11),
                            'flip': jax.random.PRNGKey(1)},
                           _dummy_batch(cfg), train=True)
    depth_vars = {'params': variables['params']['depth_net'],
                  'batch_stats': variables['batch_stats']['depth_net']}

    with tempfile.TemporaryDirectory() as td:
        # 1. fabricate the reference-format torch checkpoint (the exact
        #    payload of reference models/model_checkpoint.py:69-74)
        sd = {'model.depth_net.' + k: torch.from_numpy(np.asarray(v).copy())
              for k, v in flax_to_reference_depth_net(depth_vars).items()}
        cfg_yaml = {
            'model': {
                'name': 'SemiSupCompletionModel',
                'depth_net': {'name': 'ResNetSAN01', 'version': '18A'},
                'pose_net': {'name': ''},
                'loss': {'supervised_method': 'sparse-l1',
                         'supervised_loss_weight': 1.0},
                'params': {'min_depth': MIN_D, 'max_depth': MAX_D,
                           'crop': '', 'scale_output': 'resize'},
            },
            'tpu': {'compute_dtype': 'float32'},
            'datasets': {
                'train': {'dataset': ['Synthetic'], 'path': [''],
                          'split': ['4'], 'batch_size': 4,
                          'num_workers': 0},
                'validation': {'dataset': ['Synthetic'], 'path': [''],
                               'split': ['4'], 'batch_size': 4,
                               'num_workers': 0},
                'test': {'dataset': ['Synthetic'], 'path': [''],
                         'split': [str(args.samples)], 'batch_size': 4,
                         'num_workers': 0},
            },
        }
        ref_ckpt = os.path.join(td, 'reference.ckpt')
        torch.save({'config': cfg_yaml, 'epoch': 0, 'state_dict': sd},
                   ref_ckpt)

        # 2. import through the converter CLI machinery
        converted = os.path.join(td, 'converted.ckpt')
        convert(ref_ckpt, converted)

        # 3. full-split eval through scripts/eval.py's test()
        from eval import test as eval_test
        metrics_jax = eval_test(converted)

    # 4. independent torch-mirror chain over the SAME split
    from packnet_sfm_tpu.datasets import setup_dataset
    dataset = setup_dataset(cfg.datasets.test, cfg.datasets.augmentation,
                            'test')[0]
    tnet = load_resnet_san_into_torch(depth_vars, num_layers=18,
                                      min_depth=MIN_D, max_depth=MAX_D)
    tnet.eval()
    acc = {}
    n_img = 0
    with torch.no_grad():
        for i in range(len(dataset)):
            s = dataset[i]
            rgb = torch.from_numpy(
                s['rgb'].transpose(2, 0, 1)[None].copy())
            sig = tnet.decoder(tnet.encoder(rgb))
            sig = sig.numpy().transpose(0, 2, 3, 1)
            gt = s['depth'][None]
            d_lin = np_sigmoid_to_depth(sig, False)
            d_log = np_sigmoid_to_depth(sig, True)
            cand = {'depth': d_lin, 'depth_lin': d_lin, 'depth_log': d_log}
            for mode, pred in cand.items():
                for gt_scale, suffix in ((False, ''), (True, '_gt')):
                    v = np_metrics(gt, pred, gt_scale)
                    key = mode + suffix
                    acc[key] = acc.get(key, 0.0) + v
            n_img += 1
    metrics_torch = {k: v / n_img for k, v in acc.items()}

    # 5. compare all 7 metrics x 6 modes
    rows, max_diff, n_checked = [], 0.0, 0
    for mode, vec in sorted(metrics_torch.items()):
        for j, name in enumerate(METRIC_NAMES):
            key = '{}-{}'.format(mode, name)
            jv = metrics_jax.get(key)
            tv = float(vec[j])
            diff = abs(jv - tv) if jv is not None else float('nan')
            rows.append({'metric': key, 'jax': jv, 'torch': tv,
                         'abs_diff': diff})
            if jv is not None:
                max_diff = max(max_diff, diff)
                n_checked += 1

    ok = n_checked == 42 and max_diff < args.tol
    result = {
        'samples': args.samples,
        'n_metrics_checked': n_checked,
        'max_abs_diff': max_diff,
        'tolerance': args.tol,
        'parity_ok': bool(ok),
        'rows': rows,
    }
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ('samples', 'n_metrics_checked', 'max_abs_diff',
                       'parity_ok')}))
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
