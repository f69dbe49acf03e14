#!/bin/bash
# Round-3 gather-backward crossover sweep (lean: each scan variant is a
# multi-minute remote-AOT compile, so only the variants each question needs).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r3

# 1) shipped custom path at the b512 headline shape (take/onehot cached)
python scripts/bench_gather.py --V 1583 --rows 46080 \
  --variants take,custom_hi,custom_dh --modes fwd+bwd \
  > runs/r3/bench_gather_custom_b512.txt 2> runs/r3/bench_gather_custom_b512.err

# 2) latency-bound b32 shape: does the one-hot FORWARD win too?
python scripts/bench_gather.py --V 1583 --rows 2880 \
  --variants take,onehot_hi,custom_hi --modes fwd,fwd+bwd \
  > runs/r3/bench_gather_b32.txt 2> runs/r3/bench_gather_b32.err

# 3+4) V crossover for the backward
python scripts/bench_gather.py --V 4096 --rows 46080 \
  --variants take,custom_hi --modes fwd+bwd \
  > runs/r3/bench_gather_v4096.txt 2> runs/r3/bench_gather_v4096.err
python scripts/bench_gather.py --V 16384 --rows 46080 \
  --variants take,custom_hi --modes fwd+bwd \
  > runs/r3/bench_gather_v16384.txt 2> runs/r3/bench_gather_v16384.err

echo "GATHER_SWEEP_DONE" >> runs/r3/bench_gather_sweep.done
