#!/bin/bash
# Round-5 follow-up TPU queue (run strictly AFTER queue_tlsan_tuned_r5.py —
# one JAX process owns the chip tunnel at a time):
#   1. native-trained export anchors for the remaining 6 families (round-5
#      export harness already proved tlsan/shan/bpr; this completes the
#      "train here, serve there" story for every family)
#   2. synthetic scale rows for the two remaining stripped-dataset shapes
#      (VERDICT r4 #8): CDs-Vinyl and Movies-TV statistics, dense-f32 vs
#      the shipped big-catalog config (sparse + bf16), b32
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r5

python scripts/export_anchors.py --families "" \
  --native_families atrank,lspm,paca,csan,cnn,bilstm \
  >> runs/ref_tf/export_anchors_harness.out 2>&1

for shape in cds_vinyl movies_tv; do
  out="runs/r5/synth_${shape}_f32.json"
  if [ ! -s "$out" ]; then
    python scripts/synth_scale.py --shape $shape --batch 32 \
      --model_dir runs/r5/synth_${shape}_f32 \
      > runs/r5/synth_${shape}_f32.log 2>&1 \
      && tail -1 runs/r5/synth_${shape}_f32.log > "$out"
  fi
  out="runs/r5/synth_${shape}_sparse_bf16.json"
  if [ ! -s "$out" ]; then
    python scripts/synth_scale.py --shape $shape --batch 32 --sparse \
      --compute_dtype bf16 --model_dir runs/r5/synth_${shape}_sb16 \
      > runs/r5/synth_${shape}_sparse_bf16.log 2>&1 \
      && tail -1 runs/r5/synth_${shape}_sparse_bf16.log > "$out"
  fi
done
echo QUEUE_R5B_DONE
