#!/bin/bash
# Regenerate the RESULTS.md accuracy tables: TLSAN on all 7 shipped datasets
# (winning configs) + the 8 baselines on Clothing-Shoes (reference budgets).
# Serial on one chip; ~2-3 h total.  Usage: bash scripts/reproduce_results.sh
set -u
DATA=${DATA:-/root/reference/Data}
OUT=${OUT:-runs/reproduce}
mkdir -p "$OUT"

run() { # tag model dataset extra...
  local tag=$1 model=$2 ds=$3; shift 3
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model "$model" --dataset "$ds" \
    --data_dir "$DATA" --best_after_step 0 --model_dir "$OUT/$tag" "$@" \
    >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") in ("eval", "final") and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}

# TLSAN winning configs (RESULTS.md scoreboard)
run tlsan_clothing tlsan Clothing_Shoes_and_Jewelry --dropout 0.1 --max_epochs 60
run tlsan_dm       tlsan Digital_Music              --dropout 0.1 --max_epochs 60
run tlsan_office   tlsan Office_Products            --max_epochs 60
run tlsan_vg       tlsan Video_Games                --max_epochs 60
run tlsan_beauty   tlsan Beauty                     --dropout 0.1 --max_epochs 40
run tlsan_toys     tlsan Toys_and_Games             --dropout 0.2 --max_epochs 40
run tlsan_hk       tlsan Home_and_Kitchen           --lr_drop_step 40000 --max_epochs 40

# baselines, Clothing-Shoes, reference epoch budgets
run shan   shan   Clothing_Shoes_and_Jewelry
run atrank atrank Clothing_Shoes_and_Jewelry --seed 7
run bilstm bilstm Clothing_Shoes_and_Jewelry
run cnn    cnn    Clothing_Shoes_and_Jewelry
run lspm   lspm   Clothing_Shoes_and_Jewelry --learning_rate 0.3
run bpr    bpr    Clothing_Shoes_and_Jewelry --seed 7
run paca   paca   Clothing_Shoes_and_Jewelry
run csan   csan   Clothing_Shoes_and_Jewelry

echo REPRODUCE_DONE | tee -a "$OUT/summary.txt"
