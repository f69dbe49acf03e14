"""Evaluation: pairwise AUC and P@k/R@k over the full catalog.

Fixes two reference inefficiencies/quirks while preserving semantics:
  - AUC runs ONE forward pass per batch (the reference runs two separate
    sess.runs that recompute the identical user tower — TLSAN/model.py:239-261);
  - P@k/R@k counters reset at the start of every evaluation (the reference's
    streaming tf.metrics counters accumulate across the whole run and are
    only reset on restore — TLSAN/train.py:75-76; documented deviation).

P@k with a single relevant label equals hit/k and R@k equals hit, matching
tf.metrics.precision_at_k / recall_at_k with one label id
(reference: TLSAN/model.py:142-156).
"""

from __future__ import annotations

from contextlib import nullcontext
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tlsan_tpu.data.batcher import Batches, pad_to_multiple
from tlsan_tpu.nn import embedding

TOPK_KS = (1, 10, 20, 30, 40, 50)


def _device_data(batches: Batches, batch_size: int, mesh=None) -> Tuple[Dict, int]:
    padded = pad_to_multiple(batches, batch_size)
    n_batches = padded.n // batch_size
    multiproc = jax.process_count() > 1
    data = {}
    for k, v in padded.arrays.items():
        v = v.reshape((n_batches, batch_size) + v.shape[1:])
        if mesh is not None:  # per-batch rows sharded over dp
            sh = NamedSharding(mesh, P(None, "dp", *([None] * (v.ndim - 2))))
            if multiproc:
                # each host contributes only its local dp rows
                from tlsan_tpu.parallel.multihost import local_batch_slice
                sl = local_batch_slice(batch_size)
                data[k] = jax.make_array_from_process_local_data(
                    sh, np.asarray(v[:, sl]))
            else:
                data[k] = jax.device_put(jnp.asarray(v), sh)
        else:
            data[k] = jnp.asarray(v)
    return data, n_batches


def make_auc_fn(model, cfg, cate_list, use_pallas: bool = True):
    """Returns auc(params, test_batches_on_device) → weighted AUC over users
    (reference: TLSAN/train.py:86-96 weights batch AUC by batch size)."""

    @jax.jit
    def auc(params, data):
        def body(carry, batch):
            wins_sum, n = carry
            pos, neg = model.pair_logits(params, batch, cate_list, cfg, use_pallas)
            v = batch["valid"].astype(jnp.float32)
            wins = ((pos - neg) > 0).astype(jnp.float32)
            return (wins_sum + jnp.sum(wins * v), n + jnp.sum(v)), None

        (wins_sum, n), _ = jax.lax.scan(body, (0.0, 0.0), data)
        return wins_sum / jnp.maximum(n, 1.0)

    return auc


def make_topk_fn(model, cfg, cate_list, use_pallas: bool = True,
                 mesh=None, vocab_sharded: bool = False):
    """Returns topk(params, data) → dict of P@k / R@k for k in TOPK_KS.

    Per batch: full-catalog logits [B, I] on the MXU, top-50 indices, rank of
    the positive label, hit@k accumulation.

    Under a vocab-sharded mesh the dense [B, V] scoring would silently
    all-gather the row-sharded table every batch; instead each mp shard
    scores its own catalog rows and only k·mp candidates are exchanged
    (parallel/topk.py — the distributed replacement for the reference's
    eval matmul, TLSAN/model.py:140-156).
    """
    max_k = max(TOPK_KS)
    use_sharded = mesh is not None and vocab_sharded

    @jax.jit
    def topk(params, data):
        def body(carry, batch):
            hits_sum, n = carry
            if use_sharded:
                from tlsan_tpu.parallel.topk import sharded_topk_scores
                u_t = model.user_repr(params, batch, cate_list, cfg,
                                      use_pallas)
                all_emb, all_b = model.all_item_repr(params, cate_list, cfg)
                k_eff = min(max_k, int(all_emb.shape[0]))
                catalog = (cfg.catalog_items
                           if cfg.catalog_items
                           and cfg.catalog_items < all_emb.shape[0]
                           else None)
                _, top_idx = sharded_topk_scores(
                    mesh, u_t, all_emb, all_b, k_eff, catalog_items=catalog)
            else:
                logits = model.eval_logits(params, batch, cate_list, cfg,
                                           use_pallas)
                if cfg.catalog_items and cfg.catalog_items < logits.shape[1]:
                    # mask mp-padding catalog rows out of the ranking
                    item_ids = jnp.arange(logits.shape[1])
                    logits = jnp.where(item_ids[None, :] < cfg.catalog_items,
                                       logits, -jnp.inf)
                # catalogs smaller than 50 (tiny tests) clamp k
                k_eff = min(max_k, logits.shape[1])
                _, top_idx = jax.lax.top_k(logits, k_eff)  # [B, ≤50]
            label = batch["i"][:, None]
            match = top_idx == label  # [B, 50]
            # rank of the hit (max_k if absent)
            rank = jnp.where(
                jnp.any(match, axis=1),
                jnp.argmax(match, axis=1),
                max_k,
            )
            v = batch["valid"].astype(jnp.float32)
            hits = jnp.stack(
                [jnp.sum((rank < k).astype(jnp.float32) * v) for k in TOPK_KS])
            return (hits_sum + hits, n + jnp.sum(v)), None

        (hits_sum, n), _ = jax.lax.scan(
            body, (jnp.zeros(len(TOPK_KS)), 0.0), data)
        n = jnp.maximum(n, 1.0)
        recall = hits_sum / n
        prec = jnp.stack([recall[i] / k for i, k in enumerate(TOPK_KS)])
        return prec, recall

    return topk


class Evaluator:
    """Holds the device-resident padded test set and the jitted eval fns."""

    def __init__(self, model, cfg, cate_list, test_batches: Batches,
                 batch_size: int, use_pallas: bool = True, mesh=None,
                 vocab_sharded: bool = False):
        self.data, self.n_batches = _device_data(test_batches, batch_size, mesh)
        self._auc = make_auc_fn(model, cfg, cate_list, use_pallas)
        self._topk = make_topk_fn(model, cfg, cate_list, use_pallas,
                                  mesh=mesh, vocab_sharded=vocab_sharded)
        self._mesh, self._vs = mesh, vocab_sharded

    def _ctx(self):
        return (embedding.mesh_context(self._mesh, self._vs)
                if self._mesh is not None else nullcontext())

    def auc(self, params) -> float:
        with self._ctx():
            return float(self._auc(params, self.data))

    def topk(self, params) -> Dict[str, float]:
        with self._ctx():
            prec, recall = self._topk(params, self.data)
        prec, recall = np.asarray(prec), np.asarray(recall)
        out = {}
        for i, k in enumerate(TOPK_KS):
            out[f"P@{k}"] = float(prec[i])
            out[f"R@{k}"] = float(recall[i])
        return out
