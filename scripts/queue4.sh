#!/bin/bash
# after queue3: kernel microbench (path bug fixed), then an LSPM hyperprobe
# (is the published 0.6443 a tuned variant?)
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
python scripts/bench_kernels.py > runs/bench_kernels.txt 2>runs/bench_kernels.err
OUT=runs/lspm_probe; mkdir -p "$OUT"
run() { # tag extra...
  local tag=$1; shift
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model lspm \
    --dataset Clothing_Shoes_and_Jewelry --data_dir /root/reference/Data \
    --max_epochs 10 --best_after_step 0 --model_dir "$OUT/$tag" "$@" \
    >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") == "eval" and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run k10        --lspm_k 10
run alpha05    --lspm_alpha 0.5
run alpha2     --lspm_alpha 2.0
run reg1e3     --regulation_rate 1e-3
run reg5e5     --regulation_rate 5e-5
run lr01       --learning_rate 0.1
echo QUEUE4_DONE >> "$OUT/summary.txt"
