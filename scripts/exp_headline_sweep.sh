#!/bin/bash
# Headline candidate sweep (run when the chip is free; each candidate is
# bounded so one pathological config cannot eat the window).
# Round-3 baseline: 11.1 steps/s driver-verified (bench.py, 6 its/step).
# Levers (docs/DESIGN.md): window (pull amortization, no recompile),
# dense-Kp HBM traffic (1.3 GB/apply at n_p=18k), iteration count (pcd),
# coarse-correction budget (p1), tile size.
set -x
cd "$(dirname "$0")/.."
timeout 2400 python -u scripts/exp_headline.py warm
for cand in \
    "win16 window=16" \
    "win32 window=32" \
    "pcd precond_schur=pcd" \
    "kp2g precond_schur_dense_max=0" \
    "p1_1 precond_p1_iters=1" \
    "tile8 tile_elements=8" \
    "dots_chunked gmres_dots=chunked" \
    ; do
  timeout 1800 python -u scripts/exp_headline.py cand $cand
done
