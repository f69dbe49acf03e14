"""Observability: JSONL metric stream + stdout, and training-curve dumps.

Replaces the reference's TensorBoard FileWriters (TLSAN/model.py:17-19,
:174-183) and `(time_line, auc_value)` curve pickles (BPR/train.py:96-97;
TLSAN's own dump at TLSAN/train.py:256-258 is dead code) with an append-only
JSONL stream: one object per event with wall-clock, global step, and the
metric dict — trivially plottable and diffable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, model_dir: str, name: str = "metrics",
                 echo: bool = True):
        os.makedirs(model_dir, exist_ok=True)
        self.path = os.path.join(model_dir, f"{name}.jsonl")
        self._f = open(self.path, "a")
        self.echo = echo
        self.t0 = time.time()

    def write(self, kind: str, step: int, metrics: Dict[str, float]) -> None:
        rec = {
            "kind": kind,
            "step": int(step),
            "wall_s": round(time.time() - self.t0, 3),
            **{k: (float(v) if isinstance(v, (int, float)) else v)
               for k, v in metrics.items()},
        }
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.echo:
            body = ", ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                             for k, v in metrics.items())
            print(f"[{kind}] step={step} {body}", flush=True)

    def close(self) -> None:
        self._f.close()
