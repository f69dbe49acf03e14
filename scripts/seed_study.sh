#!/bin/bash
# Multi-seed parity study for the round-1 laggards (ATRank, LSPM on
# Clothing-Shoes). The reference's published number is the max over eval
# prints of one run; this measures our run-to-run spread.
set -u
DATA=${DATA:-/root/reference/Data}
OUT=${OUT:-runs/seed_study}
mkdir -p "$OUT"
for model in "$@"; do
  case "$model" in
    atrank|cnn|csan) epochs=10 ;;
    lspm) epochs=10 ;;
    bilstm|bpr) epochs=20 ;;
    *) epochs=20 ;;
  esac
  for seed in 42 7 2024; do
    tag="${model}_s${seed}"
    echo "=== $tag ===" | tee -a "$OUT/summary.txt"
    python -m tlsan_tpu.train.cli --model "$model" \
      --dataset Clothing_Shoes_and_Jewelry --data_dir "$DATA" \
      --max_epochs "$epochs" --seed "$seed" --best_after_step 0 \
      --model_dir "$OUT/$tag" >"$OUT/$tag.log" 2>&1
    grep -o '"auc": [0-9.]*' "$OUT/$tag.log" | sort -t' ' -k2 -g | tail -1 \
      | sed "s/^/$tag best /" | tee -a "$OUT/summary.txt"
    python - "$OUT/$tag/metrics.jsonl" "$tag" <<'EOF' | tee -a "$OUT/summary.txt"
import json, sys
best = 0.0
for line in open(sys.argv[1]):
    r = json.loads(line)
    if r.get("kind") == "eval" and "auc" in r:
        best = max(best, r["auc"])
print(f"{sys.argv[2]} best_auc={best:.4f}")
EOF
  done
done
