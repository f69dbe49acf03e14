"""Serving: jit-compiled top-k recommendation over the full catalog.

The reference has no serving path — its eval matmul (TLSAN/model.py:140) is
the closest thing.  This module packages that capability for production:
a `Recommender` holds device-resident params, compiles one
[B, D] × [D, V] MXU scoring step + top-k, and serves padded fixed-shape
request batches.  On a (dp, mp) mesh the catalog scoring runs vocab-sharded
via parallel/topk.py (k·mp candidates exchanged instead of [B, V] scores).

By default recommendations may include items from the user's own history —
the reference's eval semantics (SURVEY.md §8 quirk list); pass
`exclude_history=True` to mask them.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tlsan_tpu.core.config import (
    ModelConfig,
    load_config_json,
    model_config_from_json,
)
from tlsan_tpu.models import get_model
from tlsan_tpu.train import checkpoint

# (ids_key, length_key) pairs that can hold a user's history in a batch
_HISTORY_KEYS = (("hist_i", "sl"), ("hist_i_new", "sl_new"))


def _history_valid_mask(ids_shape, lengths, right_aligned: bool):
    """[B, L] bool: which columns hold real history items.  Left-aligned
    packing fills [0, sl); LSPM's right-aligned window fills [L-sl, L)
    (batcher._scatter_pad align='right')."""
    L = ids_shape[1]
    cols = jnp.arange(L)[None, :]
    if right_aligned:
        return cols >= (L - lengths[:, None])
    return cols < lengths[:, None]


class Recommender:
    """Top-k item recommendation from a trained model.

    recommend(batch) → (item_ids [B, k], scores [B, k]) as numpy; `batch` is
    the same dict layout the trainer/evaluator uses (u, hist_i, sl, ... —
    everything except the candidate item/label fields).
    """

    def __init__(self, model, params, cate_list, cfg: ModelConfig,
                 k: int = 50, use_pallas: Optional[bool] = None,
                 exclude_history: bool = False, batch_size: int = 128,
                 mesh=None, vocab_sharded: bool = False):
        if use_pallas is None:
            use_pallas = False  # XLA path is the measured default (RESULTS.md)
        self.model, self.cfg, self.k = model, cfg, k
        self.batch_size = batch_size
        self.params = jax.device_put(params)
        self.cate_list = jnp.asarray(cate_list)
        self._exclude = exclude_history
        self._use_pallas = use_pallas
        # LSPM packs its fixed-k window right-aligned (LSPM/input.py:30-37)
        self._right_aligned = cfg.model == "lspm"
        self._mesh, self._vs = mesh, vocab_sharded
        if mesh is not None:
            self._fn = jax.jit(self._recommend_meshed)
            self._scan_fn = None  # shard_map inside scan: keep per-chunk
        else:
            self._fn = jax.jit(self._recommend)

            @jax.jit
            def scan_all(params, chunks):
                # all request chunks in ONE dispatch (bulk scoring) — per-
                # chunk dispatch costs a host→device round trip each
                def body(_, chunk):
                    return None, self._recommend(params, chunk)
                _, (idx, vals) = jax.lax.scan(body, None, chunks)
                return idx, vals

            self._scan_fn = scan_all

    # ------------------------------------------------------------- compute

    def _recommend(self, params, batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = self.model.eval_logits(
            params, batch, self.cate_list, self.cfg, self._use_pallas)
        V = logits.shape[1]
        if self.cfg.catalog_items and self.cfg.catalog_items < V:
            # vocab-padding rows never rank
            logits = jnp.where(jnp.arange(V)[None, :] < self.cfg.catalog_items,
                               logits, -jnp.inf)
        if self._exclude:
            for ids_key, len_key in _HISTORY_KEYS:
                if ids_key in batch and len_key in batch:
                    ids = batch[ids_key]  # [B, L]
                    B, L = ids.shape
                    valid = _history_valid_mask(
                        ids.shape, batch[len_key],
                        self._right_aligned and ids_key == "hist_i")
                    rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, L))
                    logits = logits.at[rows, ids].add(
                        jnp.where(valid, -jnp.inf, 0.0))
        k_eff = min(self.k, V)
        vals, idx = jax.lax.top_k(logits, k_eff)
        return idx, vals

    def _recommend_meshed(self, params, batch):
        """(dp, mp)-meshed scoring: user towers batch-sharded over dp,
        catalog rows sharded over mp, k·mp candidate exchange
        (parallel/topk.py); history exclusion happens host-side on the
        k+slack candidates."""
        from contextlib import nullcontext

        from tlsan_tpu.nn.embedding import vocab_sharded as _vs_ctx
        from tlsan_tpu.parallel.topk import sharded_topk_scores

        with _vs_ctx(self._mesh) if self._vs else nullcontext():
            u = self.model.user_repr(params, batch, self.cate_list, self.cfg,
                                     self._use_pallas)
            all_emb, all_b = self.model.all_item_repr(params, self.cate_list,
                                                      self.cfg)
        V = all_emb.shape[0]
        bias = all_b if all_b is not None else jnp.zeros((V,), all_emb.dtype)
        if self.cfg.catalog_items and self.cfg.catalog_items < V:
            bias = jnp.where(jnp.arange(V) < self.cfg.catalog_items,
                             bias, -jnp.inf)
        # fetch slack = this batch's actual max excludable history width
        # (shapes are static at trace time), so host-side filtering always
        # leaves k survivors
        slack = 0
        if self._exclude:
            slack = sum(batch[ids_key].shape[1]
                        for ids_key, len_key in _HISTORY_KEYS
                        if ids_key in batch and len_key in batch)
        k_fetch = min(self.k + slack, V)
        vals, idx = sharded_topk_scores(self._mesh, u, all_emb, bias, k_fetch)
        return idx, vals

    def _exclude_host(self, batch, ids, vals):
        """Filter history items out of the candidate lists (mesh path)."""
        B = len(ids)
        out_i = np.full((B, self.k), -1, np.int32)
        out_v = np.full((B, self.k), -np.inf, np.float32)
        for r in range(B):
            hist = set()
            for ids_key, len_key in _HISTORY_KEYS:
                if ids_key in batch and len_key in batch:
                    n = int(batch[len_key][r])
                    row = np.asarray(batch[ids_key][r])
                    if self._right_aligned and ids_key == "hist_i":
                        row = row[len(row) - n:]
                    else:
                        row = row[:n]
                    hist.update(row.tolist())
            keep = [c for c, cand in enumerate(ids[r]) if cand not in hist]
            keep = keep[:self.k]
            out_i[r, :len(keep)] = ids[r][keep]
            out_v[r, :len(keep)] = vals[r][keep]
        return out_i, out_v

    # -------------------------------------------------------------- public

    def recommend(self, batch: Dict[str, np.ndarray]
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """Pad the request to the compiled batch size, score, unpad."""
        n = len(next(iter(batch.values())))
        B = self.batch_size
        dev = {}
        for key, v in batch.items():
            v = np.asarray(v)
            if n % B:
                pad = ((0, B - n % B),) + ((0, 0),) * (v.ndim - 1)
                v = np.pad(v, pad)
            dev[key] = jnp.asarray(v.reshape((-1, B) + v.shape[1:]))
        n_chunks = dev[next(iter(dev))].shape[0]
        if self._scan_fn is not None:
            idx, vals = self._scan_fn(self.params, dev)  # [C, B, k] each
            idx, vals = np.asarray(idx), np.asarray(vals)
            return (idx.reshape(-1, idx.shape[-1])[:n],
                    vals.reshape(-1, vals.shape[-1])[:n])
        ids_out, vals_out = [], []
        for c in range(n_chunks):
            chunk = {key: v[c] for key, v in dev.items()}
            idx, vals = self._fn(self.params, chunk)
            idx, vals = np.asarray(idx), np.asarray(vals)
            if self._exclude:
                idx, vals = self._exclude_host(chunk, idx, vals)
            else:
                idx, vals = idx[:, :self.k], vals[:, :self.k]
            ids_out.append(idx)
            vals_out.append(vals)
        return (np.concatenate(ids_out)[:n], np.concatenate(vals_out)[:n])

    # ---------------------------------------------------------- checkpoint

    @classmethod
    def from_model_dir(cls, model_dir: str, cate_list,
                       model_name: Optional[str] = None,
                       **kwargs) -> "Recommender":
        """Load the best gated-save checkpoint (falling back to latest) +
        JSON config sidecar written by the trainer — the final-epoch save is
        often past the AUC peak (train/checkpoint.py contract)."""
        path = checkpoint.best_checkpoint(model_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {model_dir}")
        sidecar = path[:-len(".ckpt")] + ".json"
        cfg_d = load_config_json(sidecar)
        cfg = model_config_from_json(cfg_d["ModelConfig"])
        model = get_model(model_name or cfg.model)
        template = model.init_params(jax.random.PRNGKey(0), cfg)
        from tlsan_tpu.core.config import TrainConfig
        from tlsan_tpu.train.state import make_optimizer
        tc = TrainConfig(**{k: v for k, v in cfg_d.get("TrainConfig", {}).items()
                            if k in TrainConfig.__dataclass_fields__})
        opt_template = make_optimizer(tc).init(template)
        _, params, _ = checkpoint.restore(path, template, opt_template)
        return cls(model, params, cate_list, cfg, **kwargs)
