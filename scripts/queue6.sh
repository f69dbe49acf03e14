#!/bin/bash
# after queue5: re-run kernel microbench with scan-fused timing, then the
# TLSAN pallas-vs-jnp train-throughput A/B
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
python scripts/bench_kernels.py > runs/bench_kernels2.txt 2>runs/bench_kernels2.err
python bench.py --steps 4000 > runs/bench_pallas.txt 2>runs/bench_pallas.err
python bench.py --steps 4000 --no_pallas > runs/bench_nopallas.txt 2>runs/bench_nopallas.err
echo QUEUE6_DONE >> runs/bench_nopallas.txt
