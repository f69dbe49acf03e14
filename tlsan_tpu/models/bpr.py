"""BPR-MF — Bayesian Personalized Ranking matrix factorization baseline.

Reference: BPR/model.py:5-75.  user(64) vs item(32)⊕cate(32) factorization,
pairwise loss −mean log σ(x) with x = i_b − j_b + u·(i−j), L2 over the
*batch* embeddings (not full tables — BPR/model.py:65-69), plain SGD without
gradient clipping (:74-75).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import base
from tlsan_tpu.nn.embedding import item_cate_lookup, lookup
from tlsan_tpu.nn.init import glorot_uniform


class BPR:
    name = "bpr"
    # tables the reference regularizes as FULL variables (dense L2 grad;
    # the sparse train path decays these analytically): row-L2 only, BPR/model.py:65-69
    l2_full_tables = ()

    @staticmethod
    def init_params(rng, cfg: ModelConfig):
        k = jax.random.split(rng, 3)
        return {
            "user_emb": glorot_uniform(
                k[0], (cfg.user_count, cfg.bpr_user_embedding_size)),
            "item_emb": glorot_uniform(
                k[1], (cfg.item_count, cfg.itemid_embedding_size)),
            "item_b": jnp.zeros((cfg.item_count,), jnp.float32),
            "cate_emb": glorot_uniform(
                k[2], (cfg.cate_count, cfg.cateid_embedding_size)),
        }

    @staticmethod
    def _embed_items(params, ids, cate_list):
        return item_cate_lookup(
            params["item_emb"], params["cate_emb"], ids, cate_list)

    @staticmethod
    def user_repr(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        return lookup(params["user_emb"], batch["u"])

    @staticmethod
    def item_repr(params, ids, cate_list, cfg: ModelConfig):
        return BPR._embed_items(params, ids, cate_list), lookup(params["item_b"], ids)

    @staticmethod
    def all_item_repr(params, cate_list, cfg: ModelConfig):
        all_emb = jnp.concatenate(
            [params["item_emb"], params["cate_emb"][cate_list]], axis=-1)
        return all_emb, params["item_b"]

    @staticmethod
    def loss(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = BPR.user_repr(params, batch, cate_list, cfg)
        i_emb, i_b = BPR.item_repr(params, batch["i"], cate_list, cfg)
        j_emb, j_b = BPR.item_repr(params, batch["j"], cate_list, cfg)
        x = i_b - j_b + jnp.sum(u * (i_emb - j_emb), axis=1)
        valid = batch.get("valid")
        # batch-level L2 (BPR/model.py:65-69)
        if valid is None:
            l2 = base.l2_tables(u, i_emb, j_emb)
            n = x.shape[0]
        else:
            v = valid.astype(jnp.float32)
            l2 = 0.5 * (jnp.sum(jnp.square(u) * v[:, None])
                        + jnp.sum(jnp.square(i_emb) * v[:, None])
                        + jnp.sum(jnp.square(j_emb) * v[:, None]))
            n = jnp.maximum(jnp.sum(v), 1.0)
        # −mean log σ(x) (BPR/model.py:71-72), stable form
        nll = jax.nn.softplus(-x)
        if valid is not None:
            nll = nll * valid.astype(jnp.float32)
        return cfg.regulation_rate * l2 + jnp.sum(nll) / n

    @staticmethod
    def pair_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = BPR.user_repr(params, batch, cate_list, cfg)
        i_emb, i_b = BPR.item_repr(params, batch["i"], cate_list, cfg)
        j_emb, j_b = BPR.item_repr(params, batch["j"], cate_list, cfg)
        return (i_b + jnp.sum(u * i_emb, 1), j_b + jnp.sum(u * j_emb, 1))

    @staticmethod
    def eval_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = BPR.user_repr(params, batch, cate_list, cfg)
        all_emb, all_b = BPR.all_item_repr(params, cate_list, cfg)
        return base.full_catalog_logits(u, all_emb, all_b)
