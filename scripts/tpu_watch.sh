#!/bin/bash
# Probe the axon tunnel every 10 min; when healthy, run the round-3 TPU
# queue (gather benches -> headline bench refresh -> accuracy re-validation).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r3 runs/acc_r3

while true; do
  if timeout 300 env PALLAS_AXON_POOL_IPS= python scripts/tpu_probe.py 120 \
      >> runs/r3/tpu_watch.log 2>&1; then
    echo "$(date +%H:%M) tunnel healthy — starting queue" >> runs/r3/tpu_watch.log
    break
  fi
  echo "$(date +%H:%M) tunnel still down" >> runs/r3/tpu_watch.log
  sleep 600
done

python scripts/bench_gather.py --V 1583 --rows 46080 \
  --variants take,custom_hi,custom_dh --modes fwd+bwd \
  > runs/r3/bench_gather_custom_b512.txt 2> runs/r3/bench_gather_custom_b512.err

python scripts/bench_gather.py --V 1583 --rows 2880 \
  --variants take,onehot_hi,custom_hi --modes fwd,fwd+bwd \
  > runs/r3/bench_gather_b32.txt 2> runs/r3/bench_gather_b32.err

python scripts/bench_gather.py --V 4096 --rows 46080 \
  --variants take,custom_hi --modes fwd+bwd \
  > runs/r3/bench_gather_v4096.txt 2> runs/r3/bench_gather_v4096.err

python scripts/bench_gather.py --V 16384 --rows 46080 \
  --variants take,custom_hi --modes fwd+bwd \
  > runs/r3/bench_gather_v16384.txt 2> runs/r3/bench_gather_v16384.err

python bench.py > runs/r3/bench_after_gather.json 2> runs/r3/bench_after_gather.err

for DS in Digital_Music Clothing_Shoes_and_Jewelry; do
  python -m tlsan_tpu.train.cli --model tlsan --dataset "$DS" \
    --data_dir /root/reference/Data --model_dir "runs/acc_r3/tlsan_${DS}" \
    > "runs/acc_r3/tlsan_${DS}.log" 2>&1
done

echo "TPU_QUEUE_DONE" >> runs/r3/tpu_watch.log
