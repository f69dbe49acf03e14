#!/bin/bash
set -u
# 1) profile-trace validation on chip
python -m tlsan_tpu.train.cli --model tlsan --dataset Digital_Music \
  --data_dir /root/reference/Data --max_epochs 2 --best_after_step 0 \
  --save_auc_gate 0 --profile --model_dir runs/prof_run > runs/prof_run.log 2>&1
ls runs/prof_run/profile > runs/prof_ls.txt 2>&1
find runs/prof_run/profile -name "*.xplane.pb" -o -name "*trace*" 2>/dev/null | head -5 >> runs/prof_ls.txt
# 2) serving throughput on chip from that checkpoint
python -m tlsan_tpu.serve.cli --model_dir runs/prof_run \
  --dataset Digital_Music --data_dir /root/reference/Data --k 50 --show 0 \
  > runs/serve_tpu.txt 2>runs/serve_tpu.err
echo QUEUE9_DONE >> runs/serve_tpu.txt
