"""
Render metric comparison tables to PNG
(reference: scripts/visualization metric-table renderers,
README_metrics_tables.md — e.g. GPU-vs-NPU comparisons).

Usage:
    python scripts/visualization/metrics_tables.py --inputs a.json b.json
        --labels GPU NPU --output table.png
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

METRICS = ['abs_rel', 'sqr_rel', 'rmse', 'rmse_log', 'a1', 'a2', 'a3']


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--inputs', nargs='+', required=True,
                   help='metric JSON files (from eval_precomputed/eval)')
    p.add_argument('--labels', nargs='+', default=None)
    p.add_argument('--output', required=True)
    p.add_argument('--title', default='Depth metrics comparison')
    return p.parse_args()


def main():
    args = parse_args()
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    labels = args.labels or [os.path.splitext(os.path.basename(f))[0]
                             for f in args.inputs]
    rows = []
    for f in args.inputs:
        with open(f) as fh:
            data = json.load(fh)
        rows.append([data.get(m, data.get('depth-' + m, float('nan')))
                     for m in METRICS])

    fig, ax = plt.subplots(figsize=(10, 0.6 * (len(rows) + 2)))
    ax.axis('off')
    table = ax.table(
        cellText=[['{:.4f}'.format(v) for v in row] for row in rows],
        rowLabels=labels, colLabels=METRICS, loc='center',
        cellLoc='center')
    table.scale(1, 1.6)
    ax.set_title(args.title)
    fig.tight_layout()
    fig.savefig(args.output, dpi=150, bbox_inches='tight')
    print('saved', args.output)


if __name__ == '__main__':
    main()
