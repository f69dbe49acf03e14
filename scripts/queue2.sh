#!/bin/bash
# after the dropout+bench queue: ATRank pallas-vs-jnp on-chip parity, then
# steps_per_call scaling for bench.py
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
OUT=runs/atrank_pallas; mkdir -p "$OUT"
for mode in pallas jnp; do
  extra=""; [ "$mode" = jnp ] && extra="--no_pallas"
  python -m tlsan_tpu.train.cli --model atrank \
    --dataset Clothing_Shoes_and_Jewelry --data_dir /root/reference/Data \
    --max_epochs 3 --best_after_step 0 $extra \
    --model_dir "$OUT/$mode" >"$OUT/$mode.log" 2>&1
done
python - "$OUT" <<'PY' | tee "$OUT/summary.txt"
import json, os
for mode in ("pallas", "jnp"):
    evals = [(r["step"], r["auc"]) for r in map(json.loads,
             open(os.path.join("runs/atrank_pallas", mode, "metrics.jsonl")))
             if r.get("kind") == "eval" and "auc" in r]
    print(mode, evals)
PY
for spc in 100 200 400 800; do
  echo "=== steps_per_call=$spc ===" >> runs/bench_spc.txt
  python bench.py --steps_per_call $spc --steps 4000 2>>runs/bench_spc.err >> runs/bench_spc.txt
done
echo QUEUE2_DONE >> runs/bench_spc.txt
