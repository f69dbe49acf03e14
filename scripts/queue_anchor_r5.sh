#!/bin/bash
# Round-5 anchor queue (single CPU core — strictly sequential):
#   1. import anchors for the two families round 4 never started (CNN, Bi-LSTM)
#   2. the CNN/Office_Products protocol-end reference run (VERDICT r4 #3) —
#      runs for the remainder of the round; log is git-tracked so every
#      matched-step Eval_AUC line survives a container reset.
set -u
cd /root/repo

python scripts/import_anchors.py --families cnn,bilstm \
  >> runs/ref_tf/anchor_queue_r5.out 2>&1

# Protocol-end CNN/Office: published protocol is 20 epochs
# (reference CNN/train.py:24-51); --fast stubs only P@k/R@k, AUC untouched.
# --save_every_eval leaves a resumable ckpt at every logged eval step.
python scripts/ref_tf_run.py --model CNN --dataset Office_Products \
  --fast --save_every_eval \
  > runs/ref_tf/cnn_office_products_r5.log 2>&1
