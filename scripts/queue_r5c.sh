#!/bin/bash
# Round-5 session-2 queue: the container reset wiped the gitignored
# import_anchors scratch dirs (patched reference copies + dataset.pkl) that
# export_anchors.py's native legs need — rebuild them (--build-only, no
# training), then run the queued follow-up work (queue_r5b.sh: native export
# anchors x6 remaining families + CDs-Vinyl/Movies-TV synthetic shape rows).
set -u
cd /root/repo
for m in ATRank LSPM PACA CSAN CNN Bi-LSTM; do
  d="runs/ref_tf/import_anchors/${m}_Digital_Music"
  if [ ! -s "$d/dataset.pkl" ]; then
    echo "[queue_r5c] rebuild scratch $m"
    python scripts/ref_tf_run.py --model "$m" --dataset Digital_Music \
      --workdir runs/ref_tf/import_anchors --build-only
  fi
done
bash scripts/queue_r5b.sh
