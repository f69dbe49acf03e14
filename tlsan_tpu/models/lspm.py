"""LSPM — Long- and Short-term Preference Model baseline.

Reference: LSPM/model.py:36-101.  Long-term user vector plus a short-term
weighted sum of the last-k items with fixed harmonic decay D = [1/k … 1/1]
(:46-49), p = u + α·s (:57); pairwise loss Σ −log clip(σ(r_i − r_j))
(:99-101, a *sum*, not a mean) with L2 over the batch embeddings (:92-97).

Batch layout: u, i (pos), j (neg), hist_i [B, k] right-aligned
(LSPM/input.py:30-37), sl.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import base
from tlsan_tpu.nn.embedding import lookup
from tlsan_tpu.nn.init import glorot_uniform


class LSPM:
    name = "lspm"
    # tables the reference regularizes as FULL variables (dense L2 grad;
    # the sparse train path decays these analytically): row-L2 only, LSPM/model.py:92-97
    l2_full_tables = ()

    @staticmethod
    def init_params(rng, cfg: ModelConfig):
        E = cfg.itemid_embedding_size
        k = jax.random.split(rng, 3)
        return {
            "item_emb": glorot_uniform(k[0], (cfg.item_count, E)),
            "short_w": glorot_uniform(k[1], (cfg.item_count, E)),
            "long_w": glorot_uniform(k[2], (cfg.user_count, E)),
        }

    @staticmethod
    def _decay(cfg: ModelConfig):
        # D = [1/k, 1/(k-1), ..., 1/1] (LSPM/model.py:46-48)
        return jnp.asarray([1.0 / (cfg.lspm_k - x) for x in range(cfg.lspm_k)],
                           jnp.float32)

    @staticmethod
    def user_repr(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        is_emb = lookup(params["short_w"], batch["hist_i"])  # [B, k, E]
        s_emb = jnp.sum(is_emb * LSPM._decay(cfg)[None, :, None], axis=1)
        u_emb = lookup(params["long_w"], batch["u"])
        return u_emb + cfg.lspm_alpha * s_emb

    @staticmethod
    def item_repr(params, ids, cate_list, cfg: ModelConfig):
        return lookup(params["item_emb"], ids), None

    @staticmethod
    def all_item_repr(params, cate_list, cfg: ModelConfig):
        return params["item_emb"], None

    @staticmethod
    def loss(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        p = LSPM.user_repr(params, batch, cate_list, cfg)
        hi = lookup(params["item_emb"], batch["i"])
        hj = lookup(params["item_emb"], batch["j"])
        x = jnp.sum(p * hi, 1) - jnp.sum(p * hj, 1)
        u_emb = lookup(params["long_w"], batch["u"])
        is_emb = lookup(params["short_w"], batch["hist_i"])
        valid = batch.get("valid")
        nll = -jnp.log(jnp.clip(jax.nn.sigmoid(x), 1e-8, 1.0))
        if valid is None:
            l2 = base.l2_tables(u_emb, is_emb, hi, hj)
            total = jnp.sum(nll)
        else:
            v = valid.astype(jnp.float32)
            l2 = 0.5 * (jnp.sum(jnp.square(u_emb) * v[:, None])
                        + jnp.sum(jnp.square(is_emb) * v[:, None, None])
                        + jnp.sum(jnp.square(hi) * v[:, None])
                        + jnp.sum(jnp.square(hj) * v[:, None]))
            total = jnp.sum(nll * v)
        # reference sums the log-loss over the batch (LSPM/model.py:99-101)
        return total + cfg.regulation_rate * l2

    @staticmethod
    def pair_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        p = LSPM.user_repr(params, batch, cate_list, cfg)
        hi = lookup(params["item_emb"], batch["i"])
        hj = lookup(params["item_emb"], batch["j"])
        return jnp.sum(p * hi, 1), jnp.sum(p * hj, 1)

    @staticmethod
    def eval_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        p = LSPM.user_repr(params, batch, cate_list, cfg)
        return base.full_catalog_logits(p, params["item_emb"], None)
