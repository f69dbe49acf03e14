#!/bin/bash
set -u
while kill -0 "$1" 2>/dev/null; do sleep 20; done
python scripts/synth_scale.py --epochs 2 > runs/synth_scale.txt 2>runs/synth_scale.err
echo SYNTH_DONE >> runs/synth_scale.txt
