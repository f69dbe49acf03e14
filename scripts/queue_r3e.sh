#!/bin/bash
# Round-3 post-sweep TPU queue: refresh the headline bench with the new
# gather path, then re-validate accuracy with the shipping 'auto' defaults
# (the one-hot backward + fused item⊕cate table change grad summation order;
# prove AUC lands in the established envelopes).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r3 runs/acc_r3

python bench.py > runs/r3/bench_after_gather.json 2> runs/r3/bench_after_gather.err

for DS in Digital_Music Clothing_Shoes_and_Jewelry; do
  python -m tlsan_tpu.train.cli --model tlsan --dataset "$DS" \
    --data_dir /root/reference/Data --model_dir "runs/acc_r3/tlsan_${DS}" \
    > "runs/acc_r3/tlsan_${DS}.log" 2>&1
done

echo "QUEUE_R3E_DONE" >> runs/r3/queue_r3e.done
