#!/bin/bash
# Round-3 third TPU batch: TLSAN matched-init trainings (Home-Kitchen) +
# b512 schedule probes (LR drop at the observed peak region)
set -u
cd "$(dirname "$0")/.."
DATA=/root/reference/Data
mkdir -p runs/r3

for s in 1234 42 7; do
  python scripts/tlsan_transplant.py train --train_seed $s \
    > runs/tlsan_transplant_s$s.log 2>&1
  grep -o "matched-init TLSAN (TF seed $s) best: {'auc': [0-9.]*" \
    runs/tlsan_transplant_s$s.log >> runs/r3/tlsan_transplant_summary.txt
done

b512() { # dataset lr epochs drop tag
  python -m tlsan_tpu.train.cli --model tlsan --dataset "$1" \
    --data_dir "$DATA" --train_batch_size 512 --learning_rate "$2" \
    --max_epochs "$3" --lr_drop_step "$4" --steps_per_call 20 \
    --eval_freq 40 --display_freq 20 --best_after_step 0 \
    --model_dir "runs/r3/$5" > "runs/r3/$5.log" 2>&1
  grep -o "best: {'auc': [0-9.]*" "runs/r3/$5.log" | tail -1 \
    | sed "s/^/$5 /" >> runs/r3/b512_summary.txt
}
b512 Digital_Music 16.0 80 1400 b512_Digi_lr16_d1400
b512 Digital_Music 24.0 80 1400 b512_Digi_lr24_d1400
b512 Digital_Music 16.0 40 1000 b512_Digi_lr16_d1000
b512 Clothing_Shoes_and_Jewelry 8.0 60 500 b512_Clot_lr8_d500

echo QUEUE_R3C_DONE

echo "=== slope roofline (RPC-corrected) + final bench ==="
python scripts/roofline.py --batch 32 --steps_per_call 200 --sparse \
  > runs/r3/roofline_b32_slope.txt 2> runs/r3/roofline_b32_slope.err
python scripts/roofline.py --batch 512 --steps_per_call 200 \
  > runs/r3/roofline_b512_slope.txt 2> runs/r3/roofline_b512_slope.err
python bench.py > runs/r3/bench_final_b32.txt 2> runs/r3/bench_final_b32.err
python bench.py --batch 512 > runs/r3/bench_final_b512.txt 2> runs/r3/bench_final_b512.err
echo QUEUE_R3C_ALL_DONE
