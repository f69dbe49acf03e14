#!/bin/bash
set -u
OUT=runs/hk_blocks; mkdir -p "$OUT"
run() { local tag=$1; shift
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model tlsan --dataset Home_and_Kitchen \
    --data_dir /root/reference/Data --best_after_step 0 \
    --model_dir "$OUT/$tag" "$@" >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") == "eval" and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run blocks2       --num_blocks 2 --max_epochs 30
run blocks2_drop  --num_blocks 2 --max_epochs 30 --lr_drop_step 40000
echo QUEUE12_DONE >> "$OUT/summary.txt"
