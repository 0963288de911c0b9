"""
Sequential hyper-parameter grid search over a training YAML — the
automated counterpart of the reference's documented weight-ratio sweep
workflow (reference: docs/training/GRID_SEARCH_AUTOMATION.md runs
w30_70..w70_30 as hand-written shell scripts + a results extractor that
does not ship in the repo).

Each grid point clones the base config, applies its overrides, trains
in-process, and records the final validation metrics; results stream to
a CSV as they finish (a crash mid-sweep keeps everything already run)
and a ranked summary prints at the end.

Usage:
    python scripts/grid_search.py configs/train_resnet_san_kitti.yaml \
        --set model.loss.supervised_loss_weight=0.3,0.5,0.7 \
        --set model.optimizer.depth.lr=1e-4,2e-4 \
        --epochs 5 --out runs/grid/results.csv [--rank-by depth-abs_rel]

`--set key=v1,v2,...` repeats; the sweep is the cartesian product.
Values parse as Python literals when possible (floats, ints, tuples),
else stay strings.
"""

import argparse
import ast
import csv
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser(description='Sequential config grid search')
    p.add_argument('file', help='base YAML config')
    p.add_argument('--set', action='append', default=[], metavar='K=V1,V2',
                   dest='grid', help='dotted config key and comma-separated '
                   'values to sweep (repeatable; cartesian product)')
    p.add_argument('--epochs', type=int, default=0,
                   help='override arch.max_epochs for every point')
    p.add_argument('--out', default='grid_results.csv',
                   help='CSV results path (streamed as points finish)')
    p.add_argument('--rank-by', default='depth-abs_rel',
                   help='metric for the final ranking (min is better '
                   'unless it contains a1/a2/a3)')
    p.add_argument('--device', default='default',
                   choices=['default', 'cpu'])
    return p.parse_args()


def _parse_values(spec):
    key, _, raw = spec.partition('=')
    if not raw:
        raise SystemExit('--set expects key=v1,v2,...: got {!r}'.format(spec))
    values = []
    for tok in raw.split(','):
        try:
            values.append(ast.literal_eval(tok))
        except (ValueError, SyntaxError):
            values.append(tok)
    return key.strip(), values


def _point_name(keys, combo):
    return '_'.join('{}={}'.format(k.rsplit('.', 1)[-1], v)
                    for k, v in zip(keys, combo))


def run_point(base_yaml, overrides, epochs):
    """Train one grid point in-process; returns final val metrics."""
    from packnet_sfm_tpu.config import parse_train_config
    from packnet_sfm_tpu.trainers.trainer import Trainer
    opts = []
    for k, v in overrides:
        opts += [k, repr(v) if isinstance(v, (tuple, list)) else str(v)]
    cfg = parse_train_config(base_yaml, opts)
    if epochs:
        cfg.arch.max_epochs = epochs
    trainer = Trainer(cfg)
    trainer.fit()
    return dict(trainer.last_val_metrics)


def main():
    args = parse_args()
    if args.device == 'cpu':
        from packnet_sfm_tpu.utils.hostjax import force_cpu
        force_cpu()
    if not args.grid:
        raise SystemExit('no --set sweeps given')
    keys, value_lists = zip(*(_parse_values(s) for s in args.grid))
    combos = list(itertools.product(*value_lists))
    print('[grid] {} points over {}'.format(len(combos), ', '.join(keys)))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    results, fieldnames = [], None
    for i, combo in enumerate(combos):
        name = _point_name(keys, combo)
        print('[grid] ({}/{}) {}'.format(i + 1, len(combos), name))
        t0 = time.time()
        try:
            metrics = run_point(args.file, list(zip(keys, combo)),
                                args.epochs)
            status = 'ok'
        except Exception as e:  # noqa: BLE001 — keep sweeping
            import traceback
            traceback.print_exc()
            metrics, status = {}, 'error: {}'.format(e)
        row = {'point': name, 'status': status,
               'train_s': round(time.time() - t0, 1),
               **{k: v for k, v in zip(keys, combo)},
               **{k: float(v) for k, v in metrics.items()
                  if isinstance(v, (int, float))}}
        results.append(row)
        # stream the CSV: every finished point is durable
        if fieldnames is None or any(k not in fieldnames for k in row):
            fieldnames = sorted({k for r in results for k in r},
                                key=lambda k: (k not in ('point', 'status'),
                                               k))
        with open(args.out, 'w', newline='') as f:
            w = csv.DictWriter(f, fieldnames=fieldnames, restval='')
            w.writeheader()
            w.writerows(results)

    scored = [r for r in results if args.rank_by in r]
    maximize = any(t in args.rank_by for t in ('a1', 'a2', 'a3'))
    scored.sort(key=lambda r: r[args.rank_by], reverse=maximize)
    print('\n[grid] ranking by {} ({})'.format(
        args.rank_by, 'max' if maximize else 'min'))
    for r in scored:
        print('  {:<40s} {:.4f}'.format(r['point'], r[args.rank_by]))
    if scored:
        print('[grid] best: {}'.format(scored[0]['point']))
    print('[grid] results -> {}'.format(args.out))


if __name__ == '__main__':
    main()
