#!/bin/bash
# round-close validation: every family end-to-end on the real chip
set -u
OUT=runs/smoke; mkdir -p "$OUT"
for m in tlsan atrank shan csan lspm paca cnn bilstm bpr; do
  python -m tlsan_tpu.train.cli --model "$m" \
    --dataset Clothing_Shoes_and_Jewelry --data_dir /root/reference/Data \
    --max_epochs 2 --best_after_step 0 --model_dir "$OUT/$m" \
    >"$OUT/$m.log" 2>&1
  status=$?
  best=$(python - "$OUT/$m/metrics.jsonl" 2>/dev/null <<'PY'
import json, sys
best = max((r["auc"] for r in map(json.loads, open(sys.argv[1]))
            if r.get("kind") in ("eval", "final") and "auc" in r), default=0)
print(f"{best:.4f}")
PY
)
  echo "$m exit=$status best_auc=$best" | tee -a "$OUT/summary.txt"
done
echo SMOKE_DONE >> "$OUT/summary.txt"
