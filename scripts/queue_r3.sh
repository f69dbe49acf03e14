#!/bin/bash
# Round-3 TPU job queue (serialized — one chip, one job at a time):
#   1. whole-step roofline at b32 and b512 (VERDICT r2 #4)
#   2. Electronics-scale steps_per_call sweep K in {100,500,1000} (#5)
#   3. TLSAN b512 LR sweep on Clothing + Digital_Music (#3)
#   4. our-side Home-Kitchen seed envelope x3 (#6)
set -u
cd "$(dirname "$0")/.."
DATA=/root/reference/Data
mkdir -p runs/r3

echo "=== 1. roofline b32/b512 ==="
python scripts/roofline.py --batch 32  --steps_per_call 200 --sparse \
  > runs/r3/roofline_b32.txt 2> runs/r3/roofline_b32.err
python scripts/roofline.py --batch 512 --steps_per_call 200 --sparse \
  > runs/r3/roofline_b512.txt 2> runs/r3/roofline_b512.err

echo "=== 2. steps_per_call sweep at Electronics scale ==="
for K in 100 500 1000; do
  python scripts/synth_scale.py --epochs 2 --steps_per_call "$K" \
    --model_dir "runs/r3/synth_K$K" \
    > "runs/r3/synth_K$K.txt" 2> "runs/r3/synth_K$K.err"
done

echo "=== 3. TLSAN b512 LR sweep ==="
for DS in Clothing_Shoes_and_Jewelry Digital_Music; do
  for LR in 1.0 2.0 4.0 8.0; do
    tag="b512_${DS:0:4}_lr${LR}"
    python -m tlsan_tpu.train.cli --model tlsan --dataset "$DS" \
      --data_dir "$DATA" --train_batch_size 512 --learning_rate "$LR" \
      --max_epochs 40 --steps_per_call 20 --eval_freq 40 \
      --display_freq 20 --best_after_step 0 \
      --model_dir "runs/r3/$tag" > "runs/r3/$tag.log" 2>&1
    grep -o "best: {'auc': [0-9.]*" "runs/r3/$tag.log" | tail -1 \
      | sed "s/^/$tag /" >> runs/r3/b512_summary.txt
  done
done

echo "=== 4. Home-Kitchen ours x3 seeds (final code) ==="
for SEED in 1234 42 7; do
  tag="hk_s$SEED"
  python -m tlsan_tpu.train.cli --model tlsan --dataset Home_and_Kitchen \
    --data_dir "$DATA" --seed "$SEED" --best_after_step 0 \
    --model_dir "runs/r3/$tag" > "runs/r3/$tag.log" 2>&1
  grep -o "best: {'auc': [0-9.]*" "runs/r3/$tag.log" | tail -1 \
    | sed "s/^/$tag /" >> runs/r3/hk_summary.txt
done

echo "QUEUE_R3_DONE"
