"""Serving CLI — batch top-k recommendations from a trained checkpoint.

  python -m tlsan_tpu.serve.cli --model_dir save_tlsan_Digital_Music \
      --dataset Digital_Music --data_dir Data --k 10

Loads the latest checkpoint (+ config sidecar), rebuilds the dataset's test
batches as request traffic, prints the first few users' top-k item ids, and
reports serving throughput (users/s, full-catalog scoring on the MXU).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from tlsan_tpu.serve.recommender import Recommender


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--model", default=None, help="default: config sidecar")
    p.add_argument("--dataset", default="Digital_Music")
    p.add_argument("--data_dir", default="Data")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--show", type=int, default=3)
    p.add_argument("--exclude_history", action="store_true")
    args = p.parse_args(argv)

    # rebuild the test split as request traffic (same packing as eval)
    from tlsan_tpu.core.config import ModelConfig
    from tlsan_tpu.train.cli import prepare

    sidecar_model = args.model or "tlsan"
    cfg0 = ModelConfig(model=sidecar_model)
    _, test_b, cate_list, _ = prepare(
        sidecar_model, os.path.join(args.data_dir, f"{args.dataset}.pkl"), cfg0)

    rec = Recommender.from_model_dir(
        args.model_dir, cate_list, args.model, k=args.k,
        batch_size=args.batch, exclude_history=args.exclude_history)

    batch = {k: v for k, v in test_b.arrays.items()
             if k not in ("i", "j", "y")}
    n = len(batch["u"]) if "u" in batch else len(next(iter(batch.values())))

    ids, scores = rec.recommend(batch)  # warm + compile
    t0 = time.perf_counter()
    ids, scores = rec.recommend(batch)
    dt = time.perf_counter() - t0

    for r in range(min(args.show, n)):
        print(json.dumps({
            "user": int(batch["u"][r]) if "u" in batch else r,
            "items": ids[r].tolist(),
            "scores": [round(float(s), 4) for s in scores[r]],
        }))
    print(json.dumps({"metric": "serve_users_per_s", "value": n / dt,
                      "unit": "users/s", "k": args.k, "catalog": len(cate_list)}))


if __name__ == "__main__":
    main()
