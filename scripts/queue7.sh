#!/bin/bash
# after queue6: LSPM learning-rate refinement (lr=0.1 beat the default 1.0)
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
OUT=runs/lspm_lr; mkdir -p "$OUT"
run() { local tag=$1; shift
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model lspm \
    --dataset Clothing_Shoes_and_Jewelry --data_dir /root/reference/Data \
    --best_after_step 0 --model_dir "$OUT/$tag" "$@" >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") == "eval" and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run lr03_e10   --learning_rate 0.3 --max_epochs 10
run lr01_e40   --learning_rate 0.1 --max_epochs 40
run lr003_e40  --learning_rate 0.03 --max_epochs 40
run lr01_adam  --learning_rate 0.001 --optimizer adam --max_epochs 20
echo QUEUE7_DONE >> "$OUT/summary.txt"
