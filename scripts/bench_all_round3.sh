#!/bin/bash
# One-shot chip session for the round-3 unbenched work. Run the moment the
# TPU tunnel is back up. Logs everything under /tmp/bench_r3/.
#
# Measures, in priority order:
#  1. bench.py              — headline selfsup_kitti (warp-v2 + fused
#                             multi-scale warp, UNBENCHED) + flagship
#  2. bench_packnet.py      — PackNet01 conv3d impl A/B (depthwise NEW)
#  3. bench_suite.py        — PackNet01 / slim-FiLM / eval FPS workloads
#  4. bench_selfsup_breakdown.py — only worth reading if (1) < 110 img/s
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/bench_r3
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "rc=$? (see $OUT/$name.{out,err})"
  tail -5 "$OUT/$name.out"
}

run bench       python bench.py
run packnet_ab  python scripts/bench_packnet.py depthwin2d depthwise conv3d+remat
run suite       python bench_suite.py --iters 15
run breakdown   python scripts/bench_selfsup_breakdown.py
# Pallas-warp kernel knob A/Bs (only worth reading if the pallaswarp
# workload in (1) beat the XLA warp): a 2-chunk displacement band cuts the
# one-hot contraction FLOPs 33% (violation flag keeps semantics exact).
run pallaswarp_win256 env PACKNET_WARP_WIN=256 python bench.py --only selfsup_kitti_pallaswarp
echo "all done: $(ls $OUT)"
