#!/bin/bash
# refined regularization grid after queue2: dropout 0.2 for Beauty/Toys,
# higher L2 for Home-Kitchen (dropout hurt it)
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
OUT=runs/tlsan_reg; mkdir -p "$OUT"
run() { # tag extra-args...
  local tag=$1; shift
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model tlsan --data_dir /root/reference/Data \
    --best_after_step 0 --model_dir "$OUT/$tag" "$@" >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") == "eval" and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run beauty_do02   --dataset Beauty --seed 7 --max_epochs 40 --dropout 0.2
run toys_do02     --dataset Toys_and_Games --seed 42 --max_epochs 40 --dropout 0.2
run hk_do005      --dataset Home_and_Kitchen --seed 1234 --max_epochs 30 --dropout 0.05
run beauty_s1234_do01 --dataset Beauty --seed 1234 --max_epochs 40 --dropout 0.1
run toys_s7_do01  --dataset Toys_and_Games --seed 7 --max_epochs 40 --dropout 0.1
echo QUEUE3_DONE >> "$OUT/summary.txt"
