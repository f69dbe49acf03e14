#!/bin/bash
set -u
OUT=runs/final_nudge; mkdir -p "$OUT"
run() { local tag=$1 ds=$2; shift 2
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model tlsan --dataset "$ds" \
    --data_dir /root/reference/Data --best_after_step 0 \
    --model_dir "$OUT/$tag" "$@" >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") in ("eval","final") and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run office_s42 Office_Products --seed 42 --max_epochs 60
run office_s7  Office_Products --seed 7 --max_epochs 60
run vg_s42     Video_Games --seed 42 --max_epochs 60
run vg_s7      Video_Games --seed 7 --max_epochs 60
run beauty_do015 Beauty --dropout 0.15 --seed 7 --max_epochs 40
run toys_do015   Toys_and_Games --dropout 0.15 --seed 42 --max_epochs 40
echo QUEUE15_DONE >> "$OUT/summary.txt"
