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
    p.add_argument("--query_mode", choices=["label", "last"], default="label",
                   help="atrank/csan condition their user tower on a query "
                        "item: 'label' keeps the held-out test positive (the "
                        "reference's eval protocol), 'last' uses the user's "
                        "most recent history item (genuine serving)")
    p.add_argument("--out", default=None,
                   help="write ALL users' recommendations as JSONL here "
                        "(bulk/offline inference)")
    args = p.parse_args(argv)

    from tlsan_tpu.core.config import (ModelConfig, load_config_json,
                                       model_config_from_json)
    from tlsan_tpu.train import checkpoint
    from tlsan_tpu.train.cli import prepare

    # the checkpoint's JSON config sidecar drives both the model choice and
    # the request packing (Ls / lspm_k / max_length / ... must match the
    # shapes the model was trained with, not the defaults)
    ckpt_path = checkpoint.best_checkpoint(args.model_dir)
    sidecar = None
    if ckpt_path is not None:
        # a missing/corrupt sidecar must not break an explicit --model run
        try:
            cfg_d = load_config_json(ckpt_path[: -len(".ckpt")] + ".json")
            sidecar = model_config_from_json(cfg_d["ModelConfig"])
        except (OSError, KeyError, ValueError, TypeError):
            sidecar = None
    model_name = args.model or (sidecar.model if sidecar else None)
    if model_name is None:
        if ckpt_path is not None:
            raise SystemExit(
                f"checkpoint {ckpt_path} has no readable config sidecar; "
                "pass --model explicitly")
        raise SystemExit(f"no checkpoint under {args.model_dir}")

    # rebuild the test split as request traffic (same packing as training)
    cfg0 = (sidecar if sidecar is not None and sidecar.model == model_name
            else ModelConfig(model=model_name))
    _, test_b, cate_list, _ = prepare(
        model_name, os.path.join(args.data_dir, f"{args.dataset}.pkl"), cfg0)

    rec = Recommender.from_model_dir(
        args.model_dir, cate_list, model_name, k=args.k,
        batch_size=args.batch, exclude_history=args.exclude_history)

    # ATRank/CSAN condition the user tower on the candidate item (reference
    # eval quirk, SURVEY.md §2.4) — their eval batch keeps "i" as the query
    drop = ("j", "y") if model_name in ("atrank", "csan") else ("i", "j", "y")
    batch = {k: v for k, v in test_b.arrays.items() if k not in drop}
    n = len(next(iter(batch.values())))
    if model_name in ("atrank", "csan"):
        if args.query_mode == "last":
            # genuine serving: query = the user's most recent history item
            last = np.maximum(batch["sl"], 1) - 1
            batch["i"] = batch["hist_i"][np.arange(n), last]
        else:
            print("WARNING: --query_mode=label conditions recommendations on "
                  "the held-out test positive (the reference's eval "
                  "protocol); use --query_mode=last for genuine serving",
                  flush=True)

    ids, scores = rec.recommend(batch)  # warm + compile
    t0 = time.perf_counter()
    ids, scores = rec.recommend(batch)
    dt = time.perf_counter() - t0

    if args.out:
        with open(args.out, "w") as f:
            for r in range(n):
                f.write(json.dumps({
                    "user": int(batch["u"][r]) if "u" in batch else r,
                    "items": ids[r].tolist(),
                    "scores": [round(float(s), 4) for s in scores[r]],
                }) + "\n")
        print(f"wrote {n} users to {args.out}")

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
