#!/usr/bin/env python3
"""Indoor-loop combined split generator.

Discovers `loop_*_640x384_newest` capture folders under a root and feeds
them through the combined-split writer (same JSON entry format / 80-10-10
defaults). Reference behavior:
scripts/data_processing/create_combined_indoor_splits.py:15-104.
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from create_combined_splits import create_combined_splits  # noqa: E402

LOOP_GLOB = 'loop_*_640x384_newest'


def discover_loops(root):
    return sorted(p for p in Path(root).glob(LOOP_GLOB) if p.is_dir())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--root', '-r', required=True,
                    help='folder containing {} directories'.format(LOOP_GLOB))
    ap.add_argument('--output', '-o', required=True)
    ap.add_argument('--ratio', nargs=3, type=float, default=[0.8, 0.1, 0.1])
    ap.add_argument('--seed', type=int, default=42)
    args = ap.parse_args(argv)
    loops = discover_loops(args.root)
    if not loops:
        raise SystemExit('no {} under {}'.format(LOOP_GLOB, args.root))
    create_combined_splits(loops, args.output, tuple(args.ratio), args.seed)


if __name__ == '__main__':
    main()
