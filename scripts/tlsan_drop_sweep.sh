#!/bin/bash
# LR-drop-at-peak: the 60-epoch curves peak then decay (overfit); dropping
# the LR just before the peak step tests whether the peak itself rises.
set -u
OUT=runs/tlsan_drop; mkdir -p "$OUT"
run() { # dataset seed epochs drop
  local tag="tlsan_$1_s$2_drop$4"
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model tlsan --dataset "$1" \
    --data_dir /root/reference/Data --max_epochs "$3" --seed "$2" \
    --lr_drop_step "$4" --best_after_step 0 --model_dir "$OUT/$tag" \
    >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") == "eval" and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run Beauty 7 40 12000
run Toys_and_Games 42 40 16000
run Home_and_Kitchen 1234 40 40000
