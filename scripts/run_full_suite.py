"""
Full test-suite run with a committed record (VERDICT r3 weak #8 / item 9).

Runs every test file SEQUENTIALLY as its own pytest process (one wedged
file costs its own timeout, never the record), streams per-file results to
tests/LAST_FULL_RUN.txt as they land (crash-durable), and finishes with a
summary line. The committed artifact turns "45 files pass" from an
extrapolation into a fact with timings.

Usage: python scripts/run_full_suite.py [--timeout-per-file 1800]
"""

import argparse
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--timeout-per-file', type=int, default=1800)
    parser.add_argument('--out', default=os.path.join(
        REPO, 'tests', 'LAST_FULL_RUN.txt'))
    args = parser.parse_args(argv)

    files = sorted(glob.glob(os.path.join(REPO, 'tests', 'test_*.py')))
    t_start = time.time()
    totals = {'passed': 0, 'failed': 0, 'skipped': 0, 'error_files': 0}
    lines = []

    with open(args.out, 'w') as out:
        out.write('# Full test-suite run (scripts/run_full_suite.py)\n')
        out.write('# started: {}\n'.format(
            time.strftime('%Y-%m-%d %H:%M:%S')))
        out.flush()
        for path in files:
            name = os.path.basename(path)
            t0 = time.time()
            try:
                proc = subprocess.run(
                    [sys.executable, '-m', 'pytest', path, '-q',
                     '--no-header', '-p', 'no:cacheprovider'],
                    cwd=REPO, capture_output=True, text=True,
                    timeout=args.timeout_per_file)
                tail = (proc.stdout.strip().splitlines() or [''])[-1]
                rc = proc.returncode
            except subprocess.TimeoutExpired:
                tail = 'TIMEOUT after {}s'.format(args.timeout_per_file)
                rc = -1
            dt = time.time() - t0
            for key in ('passed', 'failed', 'skipped'):
                m = re.search(r'(\d+) {}'.format(key), tail)
                if m:
                    totals[key] += int(m.group(1))
            # rc 5 = no tests collected; treat as note, not failure
            status = ('OK' if rc == 0 else
                      'NO-TESTS' if rc == 5 else 'FAIL')
            if status == 'FAIL':
                totals['error_files'] += 1
            line = '{:<38} {:>8.1f}s  {:<8} {}'.format(name, dt, status,
                                                       tail)
            print(line, flush=True)
            out.write(line + '\n')
            out.flush()
            lines.append((name, status))
        wall = time.time() - t_start
        summary = ('SUMMARY: {} files, {} passed / {} failed / {} skipped '
                   'tests, {} failing files, wall {:.0f}s'.format(
                       len(files), totals['passed'], totals['failed'],
                       totals['skipped'], totals['error_files'], wall))
        print(summary, flush=True)
        out.write(summary + '\n')
    return 1 if totals['error_files'] else 0


if __name__ == '__main__':
    sys.exit(main())
