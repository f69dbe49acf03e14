#!/bin/bash
# Sparse-vs-dense crossover UNDER A (dp=4, mp=2) VIRTUAL MESH (VERDICT r2 #2):
# synthetic catalogs at ~50k / ~210k / ~500k total vocab rows, identical
# data and step count, sparse vs dense wall rate on the 8-virtual-device
# CPU mesh.  (Relative rates; absolute CPU numbers are not chip numbers.)
set -u
cd "$(dirname "$0")/.."
export XLA_FLAGS="--xla_force_host_platform_device_count=8"
OUT=runs/r3/crossover_mesh.txt
mkdir -p runs/r3
: > "$OUT"
run() { # users items tag sparse-flag
  # bounded cost: 5 timed chunks (500 steps) per config, not a full epoch
  python scripts/synth_scale.py --users "$1" --items "$2" --cates 673 \
    --platform cpu --dp 4 --mp 2 --max_chunks 5 "$4" \
    --model_dir "runs/r3/xover_$3" 2>>"$OUT.err" | tail -1 >> "$OUT"
}
for cfg in "39991 22048 62k" "150000 60000 210k" "400000 100000 500k"; do
  set -- $cfg
  run "$1" "$2" "$3_dense" --no_sparse
  run "$1" "$2" "$3_sparse" --sparse
done
echo CROSSOVER_DONE >> "$OUT"
