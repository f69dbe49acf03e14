#!/bin/bash
# Round-3 follow-up TPU queue: chains after tpu_watch.sh's queue completes.
# Re-rooflines the step with the new gather defaults, probes the
# ONEHOT_BWD_MIN_ROWS boundary (B-row gathers at b512), and re-runs the
# 9-family round-close smoke matrix.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r3

while ! grep -q TPU_QUEUE_DONE runs/r3/tpu_watch.log 2>/dev/null; do sleep 60; done

python scripts/roofline.py --batch 32 \
  > runs/r3/roofline_b32_gather.txt 2> runs/r3/roofline_b32_gather.err
python scripts/roofline.py --batch 512 \
  > runs/r3/roofline_b512_gather.txt 2> runs/r3/roofline_b512_gather.err

# B-row gathers (u/c/i at b512): is the matmul backward still a win at 512
# rows from a ~1.6k-row table?
python scripts/bench_gather.py --V 1659 --D 32 --rows 512 \
  --variants take,custom_hi --modes fwd+bwd \
  > runs/r3/bench_gather_rows512.txt 2> runs/r3/bench_gather_rows512.err

bash scripts/smoke_matrix.sh > runs/r3/smoke_r3.out 2>&1

echo "TPU_QUEUE2_DONE" >> runs/r3/tpu_watch.log
