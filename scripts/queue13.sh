#!/bin/bash
set -u
OUT=runs/hk_grid2; mkdir -p "$OUT"
run() { local tag=$1; shift
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model tlsan --dataset Home_and_Kitchen \
    --data_dir /root/reference/Data --best_after_step 0 --max_epochs 30 \
    --model_dir "$OUT/$tag" "$@" >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") in ("eval","final") and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run reg1e4    --regulation_rate 1e-4
run reg5e4    --regulation_rate 5e-4
run batch64   --train_batch_size 64
run heads4    --num_heads 4
echo QUEUE13_DONE >> "$OUT/summary.txt"
