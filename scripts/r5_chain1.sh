#!/bin/bash
# Round-5 priority chain: (1) re-run the 3d1z_fine rung with the reverted
# fixed-forcing recipe (replaces the round-3 EW-polluted trace), then
# (2) drive the 3d2z_xfine zero-guess tail segments to completion.
set -e
cd "$(dirname "$0")/.."
echo "=== chain1: 3d1z_fine (fixed forcing re-run) ==="
if ! python scripts/validate.py 3d1z_fine; then
  echo "=== 3d1z_fine failed; 150 s cooldown, one retry ==="
  sleep 150
  python scripts/validate.py 3d1z_fine
fi
git add validation/
git commit -q -m "validation: re-run 3d1z_fine rung with fixed forcing (replaces EW-polluted trace)" || true
echo "=== chain1: 3d2z_xfine_seg tail ==="
bash scripts/run_seg_rung.sh 3d2z_xfine_seg
echo "=== chain1 DONE ==="
