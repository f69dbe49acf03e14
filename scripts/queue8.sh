#!/bin/bash
set -u
python bench.py > runs/bench_final.txt 2>runs/bench_final.err
OUT=runs/hk_final; mkdir -p "$OUT"
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
run adam_e20  --optimizer adam --learning_rate 0.001 --max_epochs 20
run lr03_e30  --learning_rate 0.3 --max_epochs 30
echo QUEUE8_DONE >> "$OUT/summary.txt"
