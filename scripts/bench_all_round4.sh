#!/bin/bash
# Round-4 chip session: everything to run AFTER bench.py's official capture
# (which runs first and owns the driver-visible lines). Logs under
# /tmp/bench_r4/. Each entry is bounded; a wedged compile costs one entry.
#
#  1. packnet_ab    — PackNet01 conv3d impl A/B (depthwise vs depthwin2d vs
#                     conv3d+remat) — picks the impl for selfsup_packnet01
#  2. breakdown     — selfsup_kitti ablations (warp impl, no-automask,
#                     no-sup) to localize the gap to 110 img/s
#  3. san_ab        — SAN row-window sensitivity on the flagship step
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/bench_r4
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "rc=$? (see $OUT/$name.{out,err})"
  tail -6 "$OUT/$name.out"
}

run packnet_ab  python scripts/bench_packnet.py depthwise depthwin2d conv3d+remat
run breakdown   python scripts/bench_selfsup_breakdown.py xla auto
run san_ab      python scripts/bench_san_conv.py fwdbwd
echo "all done: $(ls $OUT)"
