"""Electronics-scale synthetic stress test.

The reference's three largest category pickles are stripped from this
checkout, so the framework's behavior at the top of the reference's scale
(Electronics: 39,991 users / 22,048 items / 673 categories / 561,100
reviews) is exercised on a SYNTHETIC dataset with matching statistics:
per-user review counts and session structure drawn to hit the published
averages (14.0 behaviors/user, 4–90 distinct days).

Measures: native build+pack time, train throughput (fused scan, one chip),
full eval (AUC + P@k over the 22k catalog), peak shapes.

Usage: python scripts/synth_scale.py [--users 39991 --items 22048 ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def make_synthetic(users, items, cates, mean_reviews, seed=0):
    rng = np.random.default_rng(seed)
    # per-user review count: 10..90, mean ≈ mean_reviews (lognormal-ish)
    counts = np.clip(rng.poisson(mean_reviews - 10, users) + 10, 10, 90)
    rows_u, rows_i, rows_t = [], [], []
    # zipfian item popularity (real catalogs are heavy-tailed)
    pop = rng.zipf(1.3, size=items * 4) % items
    for u in range(users):
        n = counts[u]
        its = pop[rng.integers(0, len(pop), n)].astype(np.int32)
        # sessions: group the n reviews into 4..min(n,20) distinct days
        n_days = rng.integers(4, min(n, 20) + 1)
        days = np.sort(rng.choice(np.arange(1, 4000), n_days, replace=False))
        assign = np.sort(rng.integers(0, n_days, n))
        rows_u.append(np.full(n, u, np.int32))
        rows_i.append(its)
        rows_t.append(days[assign].astype(np.int64))
    df = pd.DataFrame({
        "reviewerID": np.concatenate(rows_u),
        "asin": np.concatenate(rows_i),
        "unixReviewTime": np.concatenate(rows_t),
    }).sort_values(["reviewerID", "unixReviewTime"], kind="stable").reset_index(drop=True)
    cate_list = rng.integers(0, cates, items).astype(np.int32)
    return df, cate_list


# the three datasets whose pickles are stripped from this checkout, by
# published statistics (reference README.md:18-23): users / items / cates /
# mean behaviors-per-user.  Each stresses a different shape regime:
# electronics = widest user axis, cds_vinyl = deepest catalogs + most items,
# movies_tv = most samples with a tiny (15) category axis.
SHAPES = {
    "electronics": dict(users=39_991, items=22_048, cates=673,
                        mean_reviews=14),
    "cds_vinyl": dict(users=24_179, items=27_602, cates=310,
                      mean_reviews=19),
    "movies_tv": dict(users=35_896, items=28_589, cates=15,
                      mean_reviews=26),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", choices=sorted(SHAPES), default=None,
                   help="preset users/items/cates/mean_reviews to a "
                        "stripped dataset's published statistics")
    p.add_argument("--users", type=int, default=39_991)
    p.add_argument("--items", type=int, default=22_048)
    p.add_argument("--cates", type=int, default=673)
    p.add_argument("--mean_reviews", type=int, default=14)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--sparse", dest="sparse", action="store_true", default=None)
    p.add_argument("--no_sparse", dest="sparse", action="store_false")
    p.add_argument("--steps_per_call", type=int, default=100,
                   help="fused-scan steps per device dispatch; larger K "
                        "amortizes the ~25ms tunnel RPC (VERDICT r2 #5)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--optimizer", default="sgd")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["f32", "float32", "bf16", "bfloat16"],
                   help="bf16 composes with --sparse (round 4): bf16 "
                        "network compute over f32 master rows")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--mp", type=int, default=1)
    p.add_argument("--platform", default=None, choices=["cpu", "default"],
                   help="cpu = host CPU (with XLA_FLAGS device count this "
                        "gives a virtual mesh for dp/mp runs)")
    p.add_argument("--model_dir", default="runs/synth_scale")
    p.add_argument("--max_chunks", type=int, default=0,
                   help=">0: skip full training; time this many fused "
                        "chunks directly (1 warmup excluded) and report "
                        "examples/s — bounded-cost mode for the CPU-mesh "
                        "sparse-vs-dense crossover study")
    args = p.parse_args()
    if args.shape:
        for k, v in SHAPES[args.shape].items():
            setattr(args, k, v)

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    t0 = time.perf_counter()
    df, cate_list = make_synthetic(args.users, args.items, args.cates,
                                   args.mean_reviews)
    print(f"synth: {len(df):,} reviews in {time.perf_counter()-t0:.1f}s",
          flush=True)

    from tlsan_tpu.data import native
    t0 = time.perf_counter()
    train_b, test_b, Ts = native.build_tlsan_packed(df, cate_list, args.items)
    build_s = time.perf_counter() - t0
    print(f"native build+pack: train={train_b.n:,} test={test_b.n:,} "
          f"Ts={Ts} in {build_s:.2f}s", flush=True)

    import dataclasses

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("TLSAN_COMPILE_CACHE",
                                     os.path.expanduser("~/.cache/tlsan_jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tlsan_tpu.core.config import ModelConfig, TrainConfig
    from tlsan_tpu.data.batcher import Batches
    from tlsan_tpu.models.tlsan import TLSAN
    from tlsan_tpu.train.loop import Trainer

    cfg = ModelConfig(model="tlsan", user_count=args.users,
                      item_count=args.items, cate_count=args.cates, Ts=Ts)
    tc = TrainConfig(model_dir=args.model_dir, max_epochs=args.epochs,
                     eval_freq=10**9, best_after_step=0, save_auc_gate=2.0,
                     sparse_updates=args.sparse,
                     compute_dtype={"f32": "float32", "bf16": "bfloat16"}.get(
                         args.compute_dtype, args.compute_dtype),
                     steps_per_call=args.steps_per_call,
                     train_batch_size=args.batch,
                     optimizer=args.optimizer,
                     dp=args.dp, mp=args.mp)
    trainer = Trainer(TLSAN, cfg, tc, cate_list, train_b, test_b,
                      use_pallas=False)
    if args.max_chunks > 0:
        import jax as _jax
        import jax.numpy as jnp
        idx = trainer._epoch_index(0)[: args.max_chunks + 1]
        t0 = time.perf_counter()
        for ci, chunk in enumerate(idx):
            trainer.params, trainer.opt_state, loss = trainer._train_chunk(
                trainer.params, trainer.opt_state, jnp.asarray(chunk))
            _jax.block_until_ready(trainer.params)
            if ci == 0:  # exclude compile+warmup chunk
                t0 = time.perf_counter()
        dt = time.perf_counter() - t0
        n_ex = args.max_chunks * args.steps_per_call * args.batch
        print(json.dumps({
            "metric": f"synth_chunk_examples_per_sec",
            "shape": args.shape or "electronics",
            "value": round(n_ex / dt, 1), "unit": "examples/s",
            "chunks": args.max_chunks, "total_s": round(dt, 1),
            "users": args.users, "items": args.items,
            "backend": jax.default_backend(), "sparse": args.sparse,
            "steps_per_call": args.steps_per_call, "batch": args.batch,
            "optimizer": args.optimizer, "dp": args.dp, "mp": args.mp,
            "compute_dtype": args.compute_dtype,
        }), flush=True)
        return
    t0 = time.perf_counter()
    best = trainer.train()
    dt = time.perf_counter() - t0
    # steady-state rate = best epoch (excludes first-epoch compile and the
    # init/final full evals); total wall reported alongside
    import json as _json
    rates = []
    with open(os.path.join(args.model_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = _json.loads(line)
            if rec.get("kind") == "epoch":
                rates.append(rec["examples_per_s"])
    eps = max(rates) if rates else train_b.n * args.epochs / dt
    print(json.dumps({
        "metric": f"synth_{args.shape or 'electronics'}_scale_examples_per_sec",
        "value": round(eps, 1), "unit": "examples/s",
        "total_s": round(dt, 1),
        "train_n": train_b.n, "users": args.users, "items": args.items,
        "build_s": round(build_s, 2), "final_auc": round(best["auc"], 4),
        "backend": jax.default_backend(), "sparse": args.sparse,
        "steps_per_call": args.steps_per_call, "batch": args.batch,
        "optimizer": args.optimizer, "dp": args.dp, "mp": args.mp,
            "compute_dtype": args.compute_dtype,
    }), flush=True)


if __name__ == "__main__":
    main()
