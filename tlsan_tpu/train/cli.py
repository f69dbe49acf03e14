"""Trainer CLI — `python -m tlsan_tpu.train.cli --model tlsan --dataset Digital_Music`.

Replaces the reference's nine per-model `train.py` flag scripts (e.g.
TLSAN/train.py:26-57) with one entry point: loads the preprocessed category
pickle, builds the model's example set (the right windowing scheme), packs it
into static shapes, and runs the Trainer.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.data import (
    build_pairwise_examples,
    build_prefix_examples,
    build_session_examples,
    load_category,
    pack_prefix_test,
    pack_prefix_train,
    pack_session_test,
    pack_session_train,
)
from tlsan_tpu.data.batcher import Batches, round8
from tlsan_tpu.models import get_model
from tlsan_tpu.train.loop import Trainer





def auto_steps_per_call(n_train: int, batch_size: int, eval_freq: int) -> int:
    """Fused-scan chunk length when --steps_per_call is not given.

    The K-sweep on the chip (RESULTS.md round-3 "dispatch amortization")
    showed K=500 recovers 2.8× wall throughput at Electronics scale
    (~11k steps/epoch) by cutting per-dispatch RPC count, while K=1000 adds
    nothing; at small scales K=100 keeps display/eval granularity and the
    wall cost of dispatch is negligible.  K never exceeds eval_freq so the
    eval cadence (chunk-boundary checks) stays on schedule."""
    steps_per_epoch = max(1, (n_train + batch_size - 1) // batch_size)
    k = 500 if steps_per_epoch >= 2000 else 100
    return max(1, min(k, eval_freq))


def prepare(model_name: str, data_path: str, cfg: ModelConfig, seed: int = 1234,
            use_cache: Optional[bool] = None
            ) -> Tuple[Batches, Batches, np.ndarray, ModelConfig]:
    """Build + pack the example set for one model family.

    Packed arrays are cached on disk (data/cache.py — the framework's
    ``dataset.pkl``, reference: TLSAN/build_dataset.py:80-84), keyed by the
    builder-code fingerprint + pickle identity + model/seed/shape config;
    a second start on the same category skips the build entirely.  Opt out
    with use_cache=False or TLSAN_DATA_CACHE=0.
    """
    from tlsan_tpu.data import cache as dcache
    if use_cache is None:
        use_cache = os.environ.get("TLSAN_DATA_CACHE", "") != "0"
    cpath = None
    if use_cache:
        cpath = dcache.cache_path(model_name, data_path, cfg, seed)
        hit = dcache.load(cpath)
        if hit is not None:
            # Merge ONLY the build-derived fields from the stored config into
            # the caller's cfg: the cache key covers the shape fields but not
            # hyperparameters like dropout/hidden_units, so returning the
            # stored cfg wholesale would silently revive stale hyperparams.
            train_b, test_b, cate_list, stored = hit
            merged = dataclasses.replace(
                cfg,
                user_count=stored.user_count,
                item_count=stored.item_count,
                cate_count=stored.cate_count,
                catalog_items=stored.catalog_items,
                Ls=stored.Ls, Ts=stored.Ts, max_length=stored.max_length)
            return train_b, test_b, cate_list, merged
    out = _prepare_uncached(model_name, data_path, cfg, seed)
    if cpath is not None:
        dcache.store(cpath, out[0], out[1], out[2], out[3])
    return out


def _prepare_uncached(model_name: str, data_path: str, cfg: ModelConfig,
                      seed: int = 1234
                      ) -> Tuple[Batches, Batches, np.ndarray, ModelConfig]:
    reviews_df, meta_df, cate_list, counts = load_category(data_path)
    cfg = cfg.with_counts(counts)

    if model_name == "tlsan":
        # fused native (C++) build+pack — bit-exact vs the Python pipeline
        # (tests/test_native_builder.py), ~30x faster on large categories
        from tlsan_tpu.data import native
        if native.available():
            train_b, test_b, Ts = native.build_tlsan_packed(
                reviews_df, cate_list, counts.item_count,
                Ls=cfg.Ls, max_length=cfg.max_length, seed=seed)
            cfg = dataclasses.replace(cfg, Ts=Ts)
            return train_b, test_b, cate_list, cfg

    if model_name in ("shan", "paca"):
        from tlsan_tpu.data import native
        if native.available():
            train_b, test_b, Ls, Ts = native.build_session_basic_packed(
                reviews_df, cate_list, counts.item_count, model_name,
                max_length=cfg.max_length, seed=seed,
                Ls_cap=cfg.paca_max_len if model_name == "paca" else None)
            cfg = dataclasses.replace(cfg, Ls=Ls, Ts=Ts)
            return train_b, test_b, cate_list, cfg

    if model_name in ("tlsan", "shan", "paca"):
        train_set, test_set = build_session_examples(
            reviews_df, cate_list, counts.item_count,
            variant=model_name, max_length=cfg.max_length, seed=seed)
        hist_idx = 0 if model_name == "paca" else 1
        if model_name == "tlsan":
            Ls = cfg.Ls  # fixed window (TLSAN/train.py:36)
        else:
            Ls = max(
                max((len(t[hist_idx]) for t in train_set), default=1),
                max((len(t[hist_idx]) for t in test_set), default=1))
        sess_max = max(
            max((len(t[2]) for t in train_set), default=1),
            max((len(t[2]) for t in test_set), default=1),
        ) if model_name != "paca" else 1
        Ts = round8(sess_max)
        if model_name != "tlsan":
            Ls = round8(Ls)
        if model_name == "paca":
            # position_w covers max_len positions (PACA/model.py:44-46)
            Ls = min(Ls, cfg.paca_max_len)
        cfg = dataclasses.replace(cfg, Ls=Ls, Ts=Ts)
        train_b = pack_session_train(train_set, Ls, Ts, model_name)
        test_b = pack_session_test(test_set, Ls, Ts, model_name)
        return train_b, test_b, cate_list, cfg

    if model_name in ("atrank", "cnn", "csan", "bilstm", "lspm"):
        time_mode = {"atrank": "bucket", "cnn": "bucket",
                     "csan": "raw", "bilstm": "none", "lspm": "none"}[model_name]
        max_length = 80 if model_name == "cnn" else cfg.max_length
        pack_pair = model_name == "lspm"
        from tlsan_tpu.data import native
        if native.available():
            # fused native (C++) build+pack, bit-exact vs the Python path
            # (tests/test_native_builder.py::test_native_prefix_matches_python)
            train_b, test_b, T = native.build_prefix_packed(
                reviews_df, counts.item_count, time_mode=time_mode,
                max_length=max_length, pack_pos_neg=pack_pair,
                align="right" if pack_pair else "left",
                T=cfg.lspm_k if pack_pair else None, seed=seed)
            cfg = dataclasses.replace(cfg, max_length=T)
            return train_b, test_b, cate_list, cfg
        train_set, test_set = build_prefix_examples(
            reviews_df, counts.item_count, time_mode=time_mode,
            max_length=max_length, pack_pos_neg=pack_pair, seed=seed)
        if model_name == "lspm":
            T = cfg.lspm_k  # fixed right-aligned window (LSPM/input.py:30-37)
            align = "right"
        else:
            T = round8(max(
                max((len(t[1]) for t in train_set), default=1),
                max((len(t[1]) for t in test_set), default=1)))
            align = "left"
        cfg = dataclasses.replace(cfg, max_length=T)
        with_time = time_mode != "none"
        tdt = np.float32 if model_name == "csan" else np.int32
        train_b = pack_prefix_train(train_set, T, with_time=with_time,
                                    pack_pos_neg=pack_pair, align=align, time_dtype=tdt)
        test_b = pack_prefix_test(test_set, T, with_time=with_time,
                                  align=align, time_dtype=tdt)
        return train_b, test_b, cate_list, cfg

    if model_name == "bpr":
        from tlsan_tpu.data import native
        if native.available():
            train_arr, test_arr = native.build_bpr_packed(
                reviews_df, counts.item_count, seed=seed)
        else:
            train_arr, test_arr = build_pairwise_examples(
                reviews_df, counts.item_count, seed=seed)
        train_b = Batches(dict(u=train_arr[:, 0], i=train_arr[:, 1],
                               j=train_arr[:, 2]), len(train_arr))
        test_b = Batches(dict(u=test_arr[:, 0], i=test_arr[:, 1],
                              j=test_arr[:, 2]), len(test_arr))
        return train_b, test_b, cate_list, cfg

    raise ValueError(f"unknown model {model_name}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="tlsan",
                   choices=["tlsan", "atrank", "shan", "csan", "lspm",
                            "paca", "cnn", "bilstm", "bpr"])
    p.add_argument("--dataset", default="Digital_Music")
    p.add_argument("--data_dir", default="Data")
    p.add_argument("--model_dir", default=None)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--test_batch_size", type=int, default=128)
    p.add_argument("--learning_rate", type=float, default=1.0)
    p.add_argument("--optimizer", default="sgd")
    p.add_argument("--lr_drop_step", type=int, default=None)
    p.add_argument("--steps_per_call", type=int, default=None,
                   help="train steps fused into one device dispatch "
                        "(default: auto — 100, or 500 at ≥2000 steps/epoch "
                        "where dispatch RPC dominates; measured K-sweep in "
                        "RESULTS.md)")
    p.add_argument("--eval_freq", type=int, default=1000)
    p.add_argument("--display_freq", type=int, default=100,
                   help="steps between train-loss log lines (granularity is "
                        "one fused chunk = steps_per_call)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--best_after_step", type=int, default=20_000)
    p.add_argument("--save_auc_gate", type=float, default=None,
                   help="checkpoint only when AUC exceeds this (per-model "
                        "reference gates: 0.8 TLSAN/ATRank/PACA, 0.7 "
                        "SHAN/CSAN/CNN/LSPM, none Bi-LSTM/BPR)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh axis (batch sharding)")
    p.add_argument("--mp", type=int, default=1,
                   help="model-parallel mesh axis (vocab-table row sharding)")
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--Ls", type=int, default=10,
                   help="TLSAN long-term window (reference flag, "
                        "TLSAN/train.py:29)")
    p.add_argument("--num_blocks", type=int, default=1,
                   help="attention blocks per tower (reference flag, "
                        "TLSAN/train.py:27)")
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--hidden_units", type=int, default=None,
                   help="default: 64 (CSAN: 32), the reference per-model "
                        "values; must equal item+cate emb width for the "
                        "concat models")
    p.add_argument("--itemid_embedding_size", type=int, default=32)
    p.add_argument("--userid_embedding_size", type=int, default=32)
    p.add_argument("--cateid_embedding_size", type=int, default=32)
    p.add_argument("--max_gradient_norm", type=float, default=5.0)
    p.add_argument("--lspm_k", type=int, default=5,
                   help="LSPM short-term window (reference k=5)")
    p.add_argument("--lspm_alpha", type=float, default=1.0,
                   help="LSPM short-term weight (reference alpha=1.0)")
    p.add_argument("--regulation_rate", type=float, default=None,
                   help="L2 rate override (reference: 1e-2 LSPM, 5e-5 others)")
    # measured on-chip (RESULTS.md): XLA's fused attention beats the
    # hand-written Pallas kernels at every production shape, so XLA is the
    # default; --pallas opts the kernels back in (kept as a testbed and for
    # shapes where a future chip/toolchain flips the verdict)
    p.add_argument("--pallas", dest="use_pallas", action="store_true",
                   default=False)
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false",
                   help="(default) use the XLA attention path")
    p.add_argument("--no_data_cache", dest="data_cache", action="store_false",
                   default=True,
                   help="rebuild+repack the example set instead of using the "
                        "packed-dataset cache (data/cache.py)")
    p.add_argument("--sparse", dest="sparse_updates", action="store_true",
                   default=None,
                   help="force sparse touched-row table updates (default: "
                        "auto by catalog size — dense XLA wins below ~100k "
                        "vocab rows, sparse above; RESULTS.md study)")
    p.add_argument("--no_sparse", dest="sparse_updates", action="store_false",
                   help="force dense [V,D] table updates")
    p.add_argument("--compute_dtype", choices=["f32", "float32", "bf16",
                                               "bfloat16"],
                   default="float32",
                   help="training compute dtype.  bf16 runs the network "
                        "forward/backward in bfloat16 with f32 master "
                        "params, optimizer state, loss reductions and L2 "
                        "(standard TPU mixed precision); eval stays f32.  "
                        "Default f32 — the bit-faithful reference contract")
    p.add_argument("--gather_bwd", choices=["auto", "take", "onehot"],
                   default="auto",
                   help="embedding-gather backward strategy: 'auto' "
                        "(default) replaces the scatter-add VJP with a "
                        "one-hot matmul for small vocab tables (measured "
                        "~2x on the gather+scatter path, exact to f32 "
                        "reorder noise — nn/embedding.py); 'take' keeps "
                        "the bitwise round-2 scatter path")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of a few train chunks "
                        "before training")
    p.add_argument("--from_scratch", action="store_true", default=True)
    p.add_argument("--resume", dest="from_scratch", action="store_false")
    p.add_argument("--no_histograms", dest="tb_histograms",
                   action="store_false", default=True,
                   help="disable TensorBoard histogram summaries")
    p.add_argument("--summary_freq", type=int, default=1000,
                   help="steps between histogram summaries (the reference "
                        "histograms at display_freq; digesting full tables "
                        "is ~100ms at Electronics scale, so the default "
                        "matches the eval cadence)")
    p.add_argument("--platform", default=None, choices=["cpu", "default"],
                   help="force the JAX platform; NOTE: this image's "
                        "sitecustomize registers the axon TPU plugin and "
                        "programmatically sets jax_platforms, so the "
                        "JAX_PLATFORMS env var alone is IGNORED — use "
                        "--platform cpu for a genuine host-CPU run")
    p.add_argument("--compile_cache",
                   default=os.environ.get("TLSAN_COMPILE_CACHE",
                                          os.path.expanduser("~/.cache/tlsan_jax")),
                   help="persistent XLA compilation cache dir ('' disables); "
                        "repeat runs skip the 20-40s first-compile")
    args = p.parse_args(argv)

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.compile_cache:
        import jax
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # per-model reference defaults (SURVEY.md §2.6)
    default_epochs = {"tlsan": 20, "atrank": 10, "csan": 20, "lspm": 10,
                      "paca": 70, "shan": 40, "cnn": 20, "bilstm": 20, "bpr": 20}
    default_drop = {"tlsan": 150_000, "atrank": 270_000, "csan": 270_000,
                    "cnn": 540_000, "lspm": 150_000, "paca": 150_000,
                    "shan": 150_000, "bilstm": 270_000, "bpr": 10**9}
    hidden = (args.hidden_units if args.hidden_units is not None
              else {"csan": 32}.get(args.model, 64))
    # LSPM regularizes at 1e-2, all others at 5e-5 (LSPM/train.py:31)
    reg = args.regulation_rate
    if reg is None:
        reg = {"lspm": 1e-2}.get(args.model, 5e-5)

    cfg = ModelConfig(model=args.model, hidden_units=hidden,
                      dropout=args.dropout, regulation_rate=reg,
                      Ls=args.Ls, num_blocks=args.num_blocks,
                      num_heads=args.num_heads,
                      itemid_embedding_size=args.itemid_embedding_size,
                      userid_embedding_size=args.userid_embedding_size,
                      cateid_embedding_size=args.cateid_embedding_size,
                      lspm_k=args.lspm_k, lspm_alpha=args.lspm_alpha)
    tc = TrainConfig(
        dataset=args.dataset,
        data_dir=args.data_dir,
        model_dir=args.model_dir or f"save_{args.model}_{args.dataset}",
        from_scratch=args.from_scratch,
        optimizer=args.optimizer,
        learning_rate=args.learning_rate,
        lr_drop_step=(args.lr_drop_step if args.lr_drop_step is not None
                      else default_drop[args.model]),
        train_batch_size=args.train_batch_size,
        test_batch_size=args.test_batch_size,
        max_epochs=(args.max_epochs if args.max_epochs is not None
                    else default_epochs[args.model]),
        eval_freq=args.eval_freq,
        display_freq=args.display_freq,
        steps_per_call=args.steps_per_call or 100,  # resolved after prepare
        seed=args.seed,
        max_gradient_norm=args.max_gradient_norm,
        best_after_step=args.best_after_step,
        # reference gate per trainer: TLSAN/train.py:228, ATRank:215,
        # PACA:208 → 0.8; SHAN/CSAN/CNN:208/214 & LSPM:206 → 0.7;
        # Bi-LSTM:70 & BPR:81 save on every new best → 0.0
        save_auc_gate=(args.save_auc_gate if args.save_auc_gate is not None
                       else {"tlsan": 0.8, "atrank": 0.8, "paca": 0.8,
                             "shan": 0.7, "csan": 0.7, "cnn": 0.7,
                             "lspm": 0.7, "bilstm": 0.0,
                             "bpr": 0.0}[args.model]),
        dp=args.dp,
        mp=args.mp,
        sparse_updates=args.sparse_updates,
        tb_histograms=args.tb_histograms,
        summary_freq=args.summary_freq,
        compute_dtype={"f32": "float32", "bf16": "bfloat16"}.get(
            args.compute_dtype, args.compute_dtype),
    )

    data_path = os.path.join(args.data_dir, f"{args.dataset}.pkl")
    train_b, test_b, cate_list, cfg = prepare(
        args.model, data_path, cfg, args.seed, use_cache=args.data_cache)
    if args.steps_per_call is None:
        tc = dataclasses.replace(tc, steps_per_call=auto_steps_per_call(
            train_b.n, tc.train_batch_size, tc.eval_freq))
    print(f"model={args.model} dataset={args.dataset} "
          f"train={train_b.n} test={test_b.n} "
          f"users={cfg.user_count} items={cfg.item_count} cates={cfg.cate_count} "
          f"steps_per_call={tc.steps_per_call}",
          flush=True)

    model = get_model(args.model)
    from tlsan_tpu.nn import embedding as _emb
    with _emb.gather_bwd(args.gather_bwd):
        trainer = Trainer(model, cfg, tc, cate_list, train_b, test_b,
                          use_pallas=args.use_pallas)
        if args.profile:
            out = trainer.profile_trace()
            print(f"profiler trace written to {out}", flush=True)
        best = trainer.train()
    print(f"best: {best}", flush=True)
    return best


if __name__ == "__main__":
    main()
