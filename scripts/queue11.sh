#!/bin/bash
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
OUT=runs/baseline_polish; mkdir -p "$OUT"
run() { local model=$1 seed=$2 ep=$3
  local tag="${model}_s${seed}"
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model "$model" \
    --dataset Clothing_Shoes_and_Jewelry --data_dir /root/reference/Data \
    --max_epochs "$ep" --seed "$seed" --best_after_step 0 \
    --model_dir "$OUT/$tag" >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") == "eval" and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run bpr 42 20
run bpr 7 20
run bpr 2024 20
run cnn 42 20
run cnn 7 20
echo QUEUE11_DONE >> "$OUT/summary.txt"
