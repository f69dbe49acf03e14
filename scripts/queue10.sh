#!/bin/bash
set -u
OUT=runs/polish; mkdir -p "$OUT"
run() { local tag=$1 ds=$2; shift 2
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model tlsan --dataset "$ds" \
    --data_dir /root/reference/Data --best_after_step 0 \
    --model_dir "$OUT/$tag" "$@" >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") == "eval" and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run clothing_do01     Clothing_Shoes_and_Jewelry --dropout 0.1 --max_epochs 60
run clothing_do01_s7  Clothing_Shoes_and_Jewelry --dropout 0.1 --max_epochs 60 --seed 7
run vg_do01           Video_Games --dropout 0.1 --max_epochs 60
run dm_do01           Digital_Music --dropout 0.1 --max_epochs 60
run office_do01       Office_Products --dropout 0.1 --max_epochs 60
echo QUEUE10_DONE >> "$OUT/summary.txt"
