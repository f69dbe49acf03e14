#!/bin/bash
# Round-4 anchor follow-up: the last unanchored below-published cell,
# LSPM/Toys (lr-tuned envelope 0.7472 vs published 0.7708) — measure the
# reference's OWN LSPM there at its shipped defaults (LSPM/train.py:32-37,
# 10 epochs, lr 1.0, seed 1234).  Same EXIT/.FAILED discipline as the
# other ref queues.
set -u
cd "$(dirname "$0")/.."
log="runs/ref_tf/lspm_toys_and_games.log"
if grep -q "^EXIT=0" "$log" 2>/dev/null; then echo "skip (done)"; exit 0; fi
nice -n 10 python scripts/ref_tf_run.py --model LSPM --dataset Toys_and_Games \
    --fast > "$log" 2>&1
rc=$?
echo "EXIT=$rc" >> "$log"
[ "$rc" -ne 0 ] && echo "{\"cell\": \"LSPM/Toys_and_Games\", \"status\": \"FAILED\", \"exit\": $rc}" \
    > runs/ref_tf/lspm_toys_and_games.FAILED.json
echo REF_ANCHOR2_DONE
