"""Grid-search CLI: sequential sweep, streamed CSV, ranked summary
(reference workflow: docs/training/GRID_SEARCH_AUTOMATION.md)."""

import csv
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_grid_search_cli(tmp_path):
    out = tmp_path / 'results.csv'
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', 'grid_search.py'),
         os.path.join(REPO, 'configs', 'overfit_synthetic.yaml'),
         '--set', 'model.loss.supervised_loss_weight=0.4,0.6',
         '--epochs', '1', '--out', str(out), '--device', 'cpu'],
        capture_output=True, text=True, timeout=3000, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert '[grid] best:' in proc.stdout
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 2
    assert {r['model.loss.supervised_loss_weight'] for r in rows} == \
        {'0.4', '0.6'}
    assert all(r['status'] == 'ok' for r in rows)
    assert all(float(r['depth-abs_rel']) > 0 for r in rows)


def test_grid_point_parsing():
    sys.path.insert(0, os.path.join(REPO, 'scripts'))
    import grid_search
    key, vals = grid_search._parse_values('model.optimizer.depth.lr=1e-4,2e-4')
    assert key == 'model.optimizer.depth.lr' and vals == [1e-4, 2e-4]
    key, vals = grid_search._parse_values('datasets.train.split=a.txt,b.txt')
    assert vals == ['a.txt', 'b.txt']
    with pytest.raises(SystemExit):
        grid_search._parse_values('no_equals_sign')
    assert grid_search._point_name(
        ['model.loss.supervised_loss_weight'], [0.4]) == \
        'supervised_loss_weight=0.4'
