#!/bin/bash
# Round-5 chip queue, phase 3: the chain2 jobs that had not landed when
# the round-5 VM restarted (kp-storage A/B completed and was adopted,
# commit d396adc):
#   1. halo-layout n_shards=1 anchor on the real chip (both operator paths)
#   2. steady-continuation wall-clock on the real chip (2D-1, mesh-2D-100)
#      + fixed-march reference row under the same session conditions
#   3. 3d1z_z16 spanwise-refinement rung (the dP anisotropy discriminator)
#   4. 3d2z_xfine floor-1e-6 tail segments (run_seg_rung auto-commits)
# Jobs log to /tmp/r5_*.log; a failure cools down once and continues —
# the chip is the scarce resource, not any one experiment.
set -u
cd "$(dirname "$0")/.."
COOL=60

run_job() {  # run_job <name> <cmd...>
  local name="$1"; shift
  echo "=== chain3: $name ($(date +%H:%M:%S)) ==="
  if ! "$@" > "/tmp/r5_${name}.log" 2>&1; then
    echo "=== $name FAILED; ${COOL}s cooldown, one retry ==="
    sleep "$COOL"
    "$@" >> "/tmp/r5_${name}.log" 2>&1 || echo "=== $name failed twice ==="
  fi
  sleep "$COOL"
}

run_job halo_quad python scripts/exp_halo_overhead.py --platform tpu \
  --mesh /root/reference/meshes/mesh-2D-100.msh --shards 1 --steps 100 --warm 10
run_job halo_tile python scripts/exp_halo_overhead.py --platform tpu \
  --mesh /root/reference/meshes/mesh-2D-100.msh --shards 1 --steps 100 --warm 10 \
  --operator-path tile

# Two invocations: the first pays any compile, the second measures.
run_job cont_warmup python main.py --case 2D-1 \
  --mesh /root/reference/meshes/mesh-2D-100.msh --steady-continuation \
  --output-dir /tmp/tpu_cont_warm
run_job cont_timed python main.py --case 2D-1 \
  --mesh /root/reference/meshes/mesh-2D-100.msh --steady-continuation \
  --output-dir /tmp/tpu_cont
# Fixed-march reference row under the SAME session conditions (50 steps
# to T=5, EW+reuse3 = the README's 0.99 steps/s recipe).
run_job fixed_march python main.py --case 2D-1 \
  --mesh /root/reference/meshes/mesh-2D-100.msh --steps 50 \
  --newton-forcing ew --newton-reuse 3 --output-dir /tmp/tpu_fixed

echo "=== chain3: 3d1z_z16 ($(date +%H:%M:%S)) ==="
if ! python scripts/validate.py 3d1z_z16 > /tmp/r5_z16.log 2>&1; then
  echo "=== z16 failed; cooldown + retry ==="
  sleep 150
  python scripts/validate.py 3d1z_z16 >> /tmp/r5_z16.log 2>&1 || true
fi
git add validation/
git commit -q -m "validation: 3d1z_z16 spanwise-refinement rung (dP anisotropy discriminator)" || true
sleep "$COOL"

echo "=== chain3: 3d2z_xfine floor-1e-6 tail segments ($(date +%H:%M:%S)) ==="
VALIDATE_SEG_STEPS=50 bash scripts/run_seg_rung.sh 3d2z_xfine_seg 40
echo "=== chain3 DONE ($(date +%H:%M:%S)) ==="
