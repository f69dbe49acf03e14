#!/bin/bash
# waits for the drop sweep (pid arg) to finish, then: dropout experiments,
# kernel microbench, bench.py — all serial on the one chip
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
OUT=runs/tlsan_dropout; mkdir -p "$OUT"
run() { # dataset seed epochs dropout
  local tag="tlsan_$1_s$2_do$4"
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model tlsan --dataset "$1" \
    --data_dir /root/reference/Data --max_epochs "$3" --seed "$2" \
    --dropout "$4" --best_after_step 0 --model_dir "$OUT/$tag" \
    >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PY' | tee -a "$OUT/summary.txt"
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") == "eval" and "auc" in r), default=0)
print(f"{sys.argv[2]} best_auc={best:.4f}")
PY
}
run Home_and_Kitchen 1234 30 0.1
run Beauty 7 40 0.1
run Toys_and_Games 42 40 0.1
python scripts/bench_kernels.py > runs/bench_kernels.txt 2>runs/bench_kernels.err
python bench.py > runs/bench_main.txt 2>runs/bench_main.err
echo ALL_DONE >> "$OUT/summary.txt"
