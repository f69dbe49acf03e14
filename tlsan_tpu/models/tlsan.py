"""TLSAN — Time-aware Long- and Short-term Attention Network (headline model).

TPU-native reimplementation of the reference graph (TLSAN/model.py:56-140,
attention_net :316-366, feature_wise_attention :370-394):

  - item(32)⊕cate(32) and user(32)⊕dominant-cate(32) embeddings (:84-95);
  - personalized time-interval positional embedding: per-user per-position
    weights `usert_emb[u] * hist_t`, scaled by a learned scalar gamma and
    multiplied into the long-term history embeddings (:98-109);
  - long-term layer: num_blocks × feature-wise attention over the fixed
    Ls-window, then a dense map expanded to a 1-step pseudo-item (:330-347);
  - short-term layer: pseudo-item concatenated before the current session,
    feature-wise attention with valid length sl_new+1 (:349-364);
  - u_t = attention output + user embedding; logits = Σ(u_t⊙i_emb)+i_b (:135-137).

Batch layout (static shapes, see data/batcher.py):
  u[B], c[B] (dominant cate), i[B], y[B], hist_i[B,Ls], hist_t[B,Ls],
  hist_i_new[B,Ts], sl[B], sl_new[B] (+ j[B] pos/neg pair at eval).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import base
from tlsan_tpu.nn.embedding import item_cate_lookup, lookup
from tlsan_tpu.nn.init import glorot_uniform
from tlsan_tpu.ops.feature_attention import (
    feature_wise_attention,
    feature_wise_attention_reference,
)


class TLSAN:
    name = "tlsan"
    # tables the reference regularizes as FULL variables (dense L2 grad;
    # the sparse train path decays these analytically): TLSAN/model.py:164-169
    l2_full_tables = ("user_emb", "item_emb", "cate_emb", "usert_emb")

    @staticmethod
    def init_params(rng, cfg: ModelConfig) -> Dict:
        D = cfg.hidden_units
        dh = D // cfg.num_heads
        keys = jax.random.split(rng, 5 + 6 * cfg.num_blocks)
        ki = iter(range(len(keys)))
        params = {
            # learned scalar scaling the positional matrix (TLSAN/model.py:58-60)
            "gamma": jnp.asarray(1.0, jnp.float32),
            "item_emb": glorot_uniform(
                keys[next(ki)], (cfg.item_count, cfg.itemid_embedding_size)),
            "item_b": jnp.zeros((cfg.item_count,), jnp.float32),
            "user_emb": glorot_uniform(
                keys[next(ki)], (cfg.user_count, cfg.userid_embedding_size)),
            # per-user position preference, init −1.0 (TLSAN/model.py:74-77)
            "usert_emb": jnp.full((cfg.user_count, cfg.Ls), -1.0, jnp.float32),
            "cate_emb": glorot_uniform(
                keys[next(ki)], (cfg.cate_count, cfg.cateid_embedding_size)),
            "long": [], "short": [],
        }
        for _ in range(cfg.num_blocks):
            params["long"].append({
                "w1": glorot_uniform(keys[next(ki)], (dh, dh)),
                "b1": jnp.zeros((dh,), jnp.float32),
                "w2": glorot_uniform(keys[next(ki)], (dh, dh)),
                "b2": jnp.zeros((dh,), jnp.float32),
                # dense map to pseudo-item (TLSAN/model.py:347)
                "proj_w": glorot_uniform(keys[next(ki)], (D, D)),
                "proj_b": jnp.zeros((D,), jnp.float32),
            })
            params["short"].append({
                "w1": glorot_uniform(keys[next(ki)], (dh, dh)),
                "b1": jnp.zeros((dh,), jnp.float32),
                "w2": glorot_uniform(keys[next(ki)], (dh, dh)),
                "b2": jnp.zeros((dh,), jnp.float32),
            })
        return params

    # ------------------------------------------------------------------ fwd

    @staticmethod
    def _embed_items(params, ids, cate_list):
        """item⊕cate embedding of an id tensor (TLSAN/model.py:84-87).
        Fused-table form for small vocabs, per-site gathers otherwise
        (nn/embedding.py item_cate_lookup)."""
        return item_cate_lookup(
            params["item_emb"], params["cate_emb"], ids, cate_list)

    @staticmethod
    def user_repr(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u, c = batch["u"], batch["c"]
        hist_i, hist_t = batch["hist_i"], batch["hist_t"]
        hist_i_new = batch["hist_i_new"]
        sl, sl_new = batch["sl"], batch["sl_new"]

        u_emb = jnp.concatenate(
            [lookup(params["user_emb"], u), lookup(params["cate_emb"], c)], axis=-1)

        # personalized time-interval positional matrix (TLSAN/model.py:98-109)
        ut = lookup(params["usert_emb"], u) * hist_t  # [B, Ls]
        h = TLSAN._embed_items(params, hist_i, cate_list)
        h = h * (params["gamma"] * ut)[..., None]
        h_new = TLSAN._embed_items(params, hist_i_new, cate_list)

        rng = batch.get("dropout_rng")
        att = (feature_wise_attention if use_pallas
               else feature_wise_attention_reference)

        def next_rng():
            nonlocal rng
            if rng is None or cfg.dropout <= 0.0:
                return None
            rng, sub = jax.random.split(rng)
            return sub

        # long-term tower (TLSAN/model.py:330-347)
        enc = h
        for blk in params["long"]:
            enc = att(enc, sl, cfg.num_heads,
                      blk["w1"], blk["b1"], blk["w2"], blk["b2"],
                      dropout_rate=cfg.dropout, rng=next_rng())
            enc = jnp.dot(enc, blk["proj_w"], precision="highest") + blk["proj_b"]
            enc = enc[:, None, :]  # 1-step pseudo-item

        # short-term tower (TLSAN/model.py:349-364): pseudo-item prepended,
        # valid length sl_new+1; each block reads the same concat input
        enc = jnp.concatenate([enc, h_new], axis=1)
        out = None
        for blk in params["short"]:
            out = att(enc, sl_new + 1, cfg.num_heads,
                      blk["w1"], blk["b1"], blk["w2"], blk["b2"],
                      dropout_rate=cfg.dropout, rng=next_rng())

        return out + u_emb  # (TLSAN/model.py:135)

    @staticmethod
    def attention_maps(params, batch, cate_list, cfg: ModelConfig):
        """(att0, att1): the long- and short-term attention maps for analysis
        and visualization — the reference exposes these as fetchable tensors
        (TLSAN/model.py:122,366; attention_net returns att0/att1).  Shapes:
        att0 [B, Ls, H, dh] over the long window, att1 [B, Ts+1, H, dh] over
        [pseudo-item ∥ short session] (softmax over the time axis)."""
        u, hist_i, hist_t = batch["u"], batch["hist_i"], batch["hist_t"]
        sl, sl_new = batch["sl"], batch["sl_new"]
        ut = lookup(params["usert_emb"], u) * hist_t
        h = TLSAN._embed_items(params, hist_i, cate_list)
        h = h * (params["gamma"] * ut)[..., None]
        h_new = TLSAN._embed_items(params, batch["hist_i_new"], cate_list)

        att0 = att1 = None
        enc = h
        for blk in params["long"]:
            enc, att0 = feature_wise_attention_reference(
                enc, sl, cfg.num_heads,
                blk["w1"], blk["b1"], blk["w2"], blk["b2"], return_soft=True)
            enc = jnp.dot(enc, blk["proj_w"], precision="highest") + blk["proj_b"]
            enc = enc[:, None, :]
        enc = jnp.concatenate([enc, h_new], axis=1)
        for blk in params["short"]:
            _, att1 = feature_wise_attention_reference(
                enc, sl_new + 1, cfg.num_heads,
                blk["w1"], blk["b1"], blk["w2"], blk["b2"], return_soft=True)
        return att0, att1

    @staticmethod
    def item_repr(params, ids, cate_list, cfg: ModelConfig):
        return TLSAN._embed_items(params, ids, cate_list), lookup(params["item_b"], ids)

    @staticmethod
    def all_item_repr(params, cate_list, cfg: ModelConfig):
        all_emb = jnp.concatenate(
            [params["item_emb"], params["cate_emb"][cate_list]], axis=-1)
        return all_emb, params["item_b"]

    # ----------------------------------------------------------------- loss

    @staticmethod
    def loss(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u_t = TLSAN.user_repr(params, batch, cate_list, cfg, use_pallas)
        i_emb, i_b = TLSAN.item_repr(params, batch["i"], cate_list, cfg)
        logits = base.pointwise_logits(u_t, i_emb, i_b)
        l2 = base.l2_tables(
            params["user_emb"], params["item_emb"],
            params["cate_emb"], params["usert_emb"])
        return (
            base.sigmoid_ce_loss(logits, batch["y"], batch.get("valid"))
            + cfg.regulation_rate * l2
        )

    @staticmethod
    def pair_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        """One fused forward for the (pos, neg) AUC pair — the reference runs
        two separate sess.runs sharing u_t (TLSAN/model.py:239-261)."""
        u_t = TLSAN.user_repr(params, batch, cate_list, cfg, use_pallas)
        pos_emb, pos_b = TLSAN.item_repr(params, batch["i"], cate_list, cfg)
        neg_emb, neg_b = TLSAN.item_repr(params, batch["j"], cate_list, cfg)
        return (
            base.pointwise_logits(u_t, pos_emb, pos_b),
            base.pointwise_logits(u_t, neg_emb, neg_b),
        )

    @staticmethod
    def eval_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        """Full-catalog scores [B, I] (TLSAN/model.py:140)."""
        u_t = TLSAN.user_repr(params, batch, cate_list, cfg, use_pallas)
        all_emb, all_b = TLSAN.all_item_repr(params, cate_list, cfg)
        return base.full_catalog_logits(u_t, all_emb, all_b)

    # L2-regularized tables (for optimizer-side weight decay, if used)
    l2_table_names = ("user_emb", "item_emb", "cate_emb", "usert_emb")
