"""Replica fan-out: train N independent seed/LR replicas in ONE program.

The reference's methodology (and this repo's parity studies) leans on seed
envelopes — N runs differing only in init seed and shuffle order — and on
small LR sweeps.  Sequentially that costs N full trainings.  On TPU the
TLSAN-class step is op-latency-bound at 2-4% of the HBM ceiling
(RESULTS.md roofline), so the chip can absorb many replicas: this module
stacks R param sets on a leading axis and `jax.vmap`s the SAME fused
scan-of-steps the Trainer runs (train/loop.py), giving per-replica
trajectories that match R separate runs while costing ~1 dispatch stream.

Semantics per replica r:
  - params_r = model.init_params(PRNGKey(seed_r))     (its own init draw)
  - its own epoch shuffle stream (batcher.epoch_index(..., seed=seed_r))
  - optional lr_scale_r: exact per-replica learning rate for SGD
    (sgd update = -schedule(t)·g_clipped, linear in lr, so post-scaling the
    shared-schedule update by lr_r/lr_base reproduces lr=lr_r exactly; the
    reference protocol is SGD everywhere — TLSAN/train.py:44)
  - pairwise AUC evaluated per replica (one vmapped pass over the test set)

No checkpointing/metric files — this is the sweep harness, not the
production Trainer; it returns per-replica curves and bests.  Composes with
bf16 mixed precision (TrainConfig.compute_dtype).  Mesh/multi-host is out
of scope (replicas are a single-chip throughput play; on a pod, run one
replica set per chip).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.data.batcher import Batches, epoch_index
from tlsan_tpu.train.evaluate import make_auc_fn, _device_data
from tlsan_tpu.train.loop import _bf16_cast, _wants_bf16
from tlsan_tpu.train.state import make_optimizer


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


class ReplicaFanout:
    def __init__(
        self,
        model,
        cfg: ModelConfig,
        tc: TrainConfig,
        cate_list: np.ndarray,
        train_batches: Batches,
        test_batches: Batches,
        seeds: Sequence[int],
        lr_scales: Optional[Sequence[float]] = None,
        use_pallas: bool = False,
    ):
        assert tc.dp == 1 and tc.mp == 1, "fan-out is single-chip; no mesh"
        if lr_scales is not None and tc.optimizer != "sgd":
            raise ValueError(
                "per-replica lr_scales are exact only for SGD (linear in "
                "lr); use a shared LR for other optimizers")
        self.model, self.cfg, self.tc = model, cfg, tc
        self.seeds = list(seeds)
        R = len(self.seeds)
        self.lr_scales = (jnp.ones((R,), jnp.float32) if lr_scales is None
                          else jnp.asarray(lr_scales, jnp.float32))
        assert self.lr_scales.shape == (R,)
        self.cate_list = jnp.asarray(cate_list)
        self.data = {k: jnp.asarray(v) for k, v in train_batches.arrays.items()}
        self.n_train = train_batches.n

        self.opt = make_optimizer(tc)
        self.params = _stack_trees([
            model.init_params(jax.random.PRNGKey(s), cfg) for s in self.seeds])
        self.opt_state = jax.vmap(self.opt.init)(self.params)
        self.step = 0

        bf16 = _wants_bf16(tc)
        cate_list_d, use_dropout = self.cate_list, cfg.dropout > 0.0
        self._rngs = jnp.stack([jax.random.PRNGKey(s + 1) for s in self.seeds])

        def loss_fn(params, batch):
            if bf16:
                params, batch = _bf16_cast(params), _bf16_cast(batch)
            return model.loss(params, batch, cate_list_d, cfg, use_pallas)

        opt = self.opt

        @partial(jax.jit, donate_argnums=(0, 1, 3))
        def fan_chunk(pstack, ostack, idx, rngs, lr_scales, data):
            """idx: [R, K, B] per-replica batch-index streams."""

            def one(params, opt_state, idx_r, rng, lr_scale):
                def step(carry, ib):
                    params, opt_state, rng = carry
                    batch = {k: v[ib] for k, v in data.items()}
                    if use_dropout:
                        rng, sub = jax.random.split(rng)
                        batch = dict(batch, dropout_rng=sub)
                    loss, grads = jax.value_and_grad(loss_fn)(params, batch)
                    updates, opt_state = opt.update(grads, opt_state, params)
                    # exact per-replica SGD lr (update is linear in lr)
                    updates = jax.tree_util.tree_map(
                        lambda u: u * lr_scale, updates)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state, rng), loss

                (params, opt_state, rng), losses = jax.lax.scan(
                    step, (params, opt_state, rng), idx_r)
                return params, opt_state, rng, jnp.mean(losses)

            return jax.vmap(one)(pstack, ostack, idx, rngs, lr_scales)

        self._fan_chunk = fan_chunk

        # per-replica pairwise AUC: vmap the Trainer's single-replica AUC
        # program over the stacked params (test data shared)
        auc_one = make_auc_fn(model, cfg, self.cate_list, use_pallas)
        self._test_data, _ = _device_data(test_batches, tc.test_batch_size)
        self._fan_auc = jax.jit(jax.vmap(auc_one, in_axes=(0, None)))

    # ------------------------------------------------------------------

    def _epoch_index(self, epoch: int) -> np.ndarray:
        """[n_chunks, R, K, B]: each replica gets its OWN seed's shuffle
        stream (the reference seed study varies init AND batch order) —
        per replica this is exactly the Trainer's epoch_index
        (data/batcher.py, shared code: parity by construction)."""
        B, K = self.tc.train_batch_size, self.tc.steps_per_call
        per_replica = [epoch_index(self.n_train, B, K, epoch, s)
                       for s in self.seeds]
        # [R, n_chunks, K, B] → [n_chunks, R, K, B]
        return np.stack(per_replica).transpose(1, 0, 2, 3)

    def auc(self) -> np.ndarray:
        return np.asarray(self._fan_auc(self.params, self._test_data))

    def train(self, log=print) -> Dict:
        tc = self.tc
        R = len(self.seeds)
        best = np.zeros(R)
        best_step = np.zeros(R, np.int64)
        curves: List[Dict] = []
        steps_since_eval = 0
        t0 = time.time()
        compile_s = None  # first-chunk time ≈ compile + warmup
        examples = 0
        for epoch in range(tc.max_epochs):
            for chunk_idx in self._epoch_index(epoch):
                (self.params, self.opt_state, self._rngs,
                 losses) = self._fan_chunk(
                    self.params, self.opt_state, jnp.asarray(chunk_idx),
                    self._rngs, self.lr_scales, self.data)
                if compile_s is None:
                    jax.block_until_ready(losses)
                    compile_s = time.time() - t0
                self.step += chunk_idx.shape[1]
                steps_since_eval += chunk_idx.shape[1]
                examples += chunk_idx.size
                if steps_since_eval >= tc.eval_freq:
                    steps_since_eval = 0
                    aucs = self.auc()
                    hit = (self.step > tc.best_after_step) & (aucs > best)
                    best = np.where(hit, aucs, best)
                    best_step = np.where(hit, self.step, best_step)
                    curves.append({"step": self.step,
                                   "auc": [round(float(a), 6) for a in aucs]})
                    log(f"[fanout] step={self.step} "
                        f"auc={np.array2string(aucs, precision=4)} "
                        f"loss={np.array2string(np.asarray(losses), precision=4)}")
        aucs = self.auc()
        hit = aucs > best
        best = np.where(hit, aucs, best)
        best_step = np.where(hit, self.step, best_step)
        wall = time.time() - t0
        return {
            "seeds": self.seeds,
            "lr_scales": [float(x) for x in self.lr_scales],
            "best_auc": [round(float(a), 6) for a in best],
            "best_step": [int(s) for s in best_step],
            "mean_best": round(float(best.mean()), 6),
            "range": [round(float(best.min()), 6), round(float(best.max()), 6)],
            "wall_s": round(wall, 2),
            "compile_s": round(compile_s or 0.0, 2),
            "post_compile_wall_s": round(wall - (compile_s or 0.0), 2),
            "replica_examples_per_s": round(examples / wall, 1),
            # compile-excluded rate: short probes are compile-dominated
            "post_compile_replica_examples_per_s": round(
                examples / max(wall - (compile_s or 0.0), 1e-9), 1),
            "curves": curves,
        }


def main(argv=None):
    import argparse
    import json
    import os

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="tlsan")
    p.add_argument("--dataset", default="Clothing_Shoes_and_Jewelry")
    p.add_argument("--data_dir", default="/root/reference/Data")
    p.add_argument("--seeds", type=int, nargs="+",
                   default=[1234, 42, 7, 99, 2024, 11, 5, 321])
    p.add_argument("--lr_scales", type=float, nargs="+", default=None,
                   help="per-replica LR multipliers (SGD only); default all 1")
    p.add_argument("--max_epochs", type=int, default=20)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--test_batch_size", type=int, default=128)
    p.add_argument("--learning_rate", type=float, default=1.0)
    p.add_argument("--lr_drop_step", type=int, default=150_000)
    p.add_argument("--eval_freq", type=int, default=1000)
    p.add_argument("--steps_per_call", type=int, default=100)
    p.add_argument("--best_after_step", type=int, default=0)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--build_seed", type=int, default=1234,
                   help="dataset-builder seed (fixed; replicas vary TRAIN "
                        "seeds only, like the reference seed studies)")
    p.add_argument("--compute_dtype", choices=["f32", "float32", "bf16",
                                               "bfloat16"], default="float32")
    p.add_argument("--platform", default=None, choices=["cpu", "default"])
    p.add_argument("--out", default=None, help="write the result JSON here")
    args = p.parse_args(argv)

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/tlsan_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tlsan_tpu.models import get_model
    from tlsan_tpu.train.cli import prepare

    cfg = ModelConfig(model=args.model, dropout=args.dropout,
                      hidden_units={"csan": 32}.get(args.model, 64),
                      regulation_rate={"lspm": 1e-2}.get(args.model, 5e-5))
    tc = TrainConfig(
        optimizer="sgd", learning_rate=args.learning_rate,
        lr_drop_step=args.lr_drop_step,
        train_batch_size=args.train_batch_size,
        test_batch_size=args.test_batch_size,
        max_epochs=args.max_epochs, eval_freq=args.eval_freq,
        steps_per_call=args.steps_per_call,
        best_after_step=args.best_after_step,
        compute_dtype={"f32": "float32", "bf16": "bfloat16"}.get(
            args.compute_dtype, args.compute_dtype))
    data_path = os.path.join(args.data_dir, f"{args.dataset}.pkl")
    train_b, test_b, cate_list, cfg = prepare(
        args.model, data_path, cfg, args.build_seed)
    print(f"fanout model={args.model} dataset={args.dataset} "
          f"replicas={len(args.seeds)} train={train_b.n} test={test_b.n}",
          flush=True)
    fan = ReplicaFanout(get_model(args.model), cfg, tc, cate_list,
                        train_b, test_b, args.seeds, args.lr_scales)
    result = fan.train()
    out = dict(result)
    out.pop("curves")
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
