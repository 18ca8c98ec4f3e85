#!/bin/bash
# Drive a segmented validation rung (scripts/validate.py SEGMENTED entry)
# to completion, committing the partial trace + checkpoint after EVERY
# segment so a round boundary can never lose chip time.
#
#   bash scripts/run_seg_rung.sh 2d2_855k_seg [max_segments]
#
# Stops on the first failed segment (device outage etc.) — rerun to resume.
set -e
cd "$(dirname "$0")/.."
RUNG="${1:?usage: run_seg_rung.sh <rung> [max_segments]}"
MAX="${2:-40}"
for i in $(seq 1 "$MAX"); do
  echo "=== segment attempt $i/$MAX for $RUNG ==="
  # A client launched seconds after the previous one exits can find the
  # device still holding the old client's memory (RESOURCE_EXHAUSTED —
  # the axon teardown lag, see CLAUDE.md).  Cool down once and retry
  # before giving up; a second failure stops the loop (rerun to resume).
  if ! python scripts/validate.py "$RUNG"; then
    echo "=== segment failed; 150 s cooldown, then one retry ==="
    sleep 150
    python scripts/validate.py "$RUNG"
  fi
  git add validation/
  git commit -q -m "validation: $RUNG segment (auto-commit by run_seg_rung.sh)" || true
  # Completed? validate.py promotes the partial and removes the checkpoint.
  if [ ! -f "validation/checkpoints/${RUNG%_seg}.npz" ]; then
    echo "=== $RUNG COMPLETE ==="
    exit 0
  fi
done
echo "=== $RUNG: segment budget exhausted (still incomplete) ==="
