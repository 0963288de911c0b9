#!/bin/bash
# Round-5 chip session: serial on-chip A/Bs AFTER the device profile.
# Logs land in artifacts/bench_r5/ (committed — round 4's /tmp logs died
# with the host; VERDICT r4 weak #6).
#
#  1. packnet_ab — PackNet01 conv3d impl A/B (depthwise vs depthwin2d vs
#                  conv3d+remat), picks networks/layers/packnet.CONV3D_IMPL
#  2. warp_force — selfsup step with PACKNET_WARP_IMPL=force (timing-only:
#                  no violation cond at all). Localizes the flat in-step
#                  A/B: force fast => the cond structure eats the win;
#                  force flat => the kernel itself is slow in-context.
#  3. breakdown  — selfsup ablations (no_automask / no_sup) under 'auto'
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/bench_r5
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2700 "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  echo "rc=$? (see $OUT/$name.{out,err})"
  tail -8 "$OUT/$name.out"
}

run packnet_ab python scripts/bench_packnet.py depthwise depthwin2d conv3d+remat
PACKNET_WARP_IMPL=force PACKNET_WARP_FORCE_OK=1 \
  run warp_force python scripts/bench_selfsup_breakdown.py force
run breakdown python scripts/bench_selfsup_breakdown.py auto:no_automask auto:no_sup
echo "all done: $(ls $OUT)"
