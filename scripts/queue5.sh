#!/bin/bash
# after queue4: TLSAN Ls probe on Home-Kitchen (the paper tunes Ls; repo
# default is 10) + one usert-position sanity at Ls=20 on Beauty
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
OUT=runs/hk_ls; mkdir -p "$OUT"
run() { # tag dataset extra...
  local tag=$1 ds=$2; shift 2
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model tlsan --dataset "$ds" \
    --data_dir /root/reference/Data --max_epochs 30 --best_after_step 0 \
    --model_dir "$OUT/$tag" "$@" >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") == "eval" and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run hk_ls5   Home_and_Kitchen --Ls 5
run hk_ls15  Home_and_Kitchen --Ls 15
run hk_ls20  Home_and_Kitchen --Ls 20
run beauty_ls20 Beauty --Ls 20 --dropout 0.1 --seed 7 --max_epochs 40
echo QUEUE5_DONE >> "$OUT/summary.txt"
