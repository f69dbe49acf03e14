#!/bin/bash
# Round-3 follow-up TPU queue: b512 LR/schedule completion, quiet-host
# bench + roofline re-runs (post batch-hoist), then the CPU-mesh crossover.
set -u
cd "$(dirname "$0")/.."
DATA=/root/reference/Data
mkdir -p runs/r3

b512() { # dataset lr epochs tag
  python -m tlsan_tpu.train.cli --model tlsan --dataset "$1" \
    --data_dir "$DATA" --train_batch_size 512 --learning_rate "$2" \
    --max_epochs "$3" --steps_per_call 20 --eval_freq 40 \
    --display_freq 20 --best_after_step 0 \
    --model_dir "runs/r3/$4" > "runs/r3/$4.log" 2>&1
  grep -o "best: {'auc': [0-9.]*" "runs/r3/$4.log" | tail -1 \
    | sed "s/^/$4 /" >> runs/r3/b512_summary.txt
}

echo "=== b512 completion ==="
b512 Clothing_Shoes_and_Jewelry 16.0 40 b512_Clot_lr16
b512 Digital_Music 16.0 40 b512_Digi_lr16
b512 Digital_Music 8.0 80 b512_Digi_lr8_e80
b512 Digital_Music 16.0 80 b512_Digi_lr16_e80

echo "=== quiet bench (post-hoist) ==="
python bench.py > runs/r3/bench_hoist_b32.txt 2> runs/r3/bench_hoist_b32.err
python bench.py --batch 512 > runs/r3/bench_hoist_b512.txt 2> runs/r3/bench_hoist_b512.err

echo "=== quiet roofline ==="
python scripts/roofline.py --batch 32 --steps_per_call 200 --sparse \
  > runs/r3/roofline_b32_quiet.txt 2> runs/r3/roofline_b32_quiet.err
python scripts/roofline.py --batch 512 --steps_per_call 200 \
  > runs/r3/roofline_b512_quiet.txt 2> runs/r3/roofline_b512_quiet.err

echo "=== crossover on the now-quiet host ==="
bash scripts/crossover_mesh.sh

echo "QUEUE_R3B_DONE"
