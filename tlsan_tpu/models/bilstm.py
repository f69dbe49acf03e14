"""Bi-LSTM baseline: bidirectional LSTM user encoder.

Reference: Bi-LSTM/model.py:20-75.  item(32)⊕cate(32) history → 1-layer
bidirectional LSTM(64); user repr = dense(concat(fw output at step sl−1,
bw output at step 0)) (:60-70).  logits = i_b + Σ(u⊙i) (:74); loss = mean
sigmoid-CE + 5e-5 · L2(user/item/cate tables) (:107-119) — note user_emb_w is
regularized but unused in the forward pass (reference quirk preserved).

The backward direction reverses only the valid prefix (tf
bidirectional_dynamic_rnn with sequence_length); its output at original step
0 equals the reversed-sequence output at step sl−1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import base
from tlsan_tpu.nn.embedding import item_cate_lookup, lookup
from tlsan_tpu.nn.init import glorot_uniform
from tlsan_tpu.nn.layers import dense, gather_time, lstm_scan, reverse_valid


class BiLSTM:
    name = "bilstm"
    # tables the reference regularizes as FULL variables (dense L2 grad;
    # the sparse train path decays these analytically): Bi-LSTM/model.py:108-112
    l2_full_tables = ("user_emb", "item_emb", "cate_emb")

    @staticmethod
    def init_params(rng, cfg: ModelConfig):
        H = cfg.lstm_hidden_units
        D = cfg.itemid_embedding_size + cfg.cateid_embedding_size
        k = jax.random.split(rng, 6)
        return {
            "user_emb": glorot_uniform(k[0], (cfg.user_count, H)),
            "item_emb": glorot_uniform(
                k[1], (cfg.item_count, cfg.itemid_embedding_size)),
            "item_b": jnp.zeros((cfg.item_count,), jnp.float32),
            "cate_emb": glorot_uniform(
                k[2], (cfg.cate_count, cfg.cateid_embedding_size)),
            "lstm_fw_w": glorot_uniform(k[3], (D + H, 4 * H)),
            "lstm_fw_b": jnp.zeros((4 * H,), jnp.float32),
            "lstm_bw_w": glorot_uniform(k[4], (D + H, 4 * H)),
            "lstm_bw_b": jnp.zeros((4 * H,), jnp.float32),
            "out_w": glorot_uniform(k[5], (2 * H, H)),
            "out_b": jnp.zeros((H,), jnp.float32),
        }

    @staticmethod
    def _embed_items(params, ids, cate_list):
        return item_cate_lookup(
            params["item_emb"], params["cate_emb"], ids, cate_list)

    @staticmethod
    def user_repr(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        H = cfg.lstm_hidden_units
        h = BiLSTM._embed_items(params, batch["hist_i"], cate_list)
        sl = batch["sl"]
        fw = lstm_scan(h, params["lstm_fw_w"], params["lstm_fw_b"], H)
        bw = lstm_scan(reverse_valid(h, sl),
                       params["lstm_bw_w"], params["lstm_bw_b"], H)
        hist = jnp.concatenate(
            [gather_time(fw, sl - 1), gather_time(bw, sl - 1)], axis=-1)
        return dense(hist, params["out_w"], params["out_b"])

    @staticmethod
    def item_repr(params, ids, cate_list, cfg: ModelConfig):
        return BiLSTM._embed_items(params, ids, cate_list), lookup(params["item_b"], ids)

    @staticmethod
    def all_item_repr(params, cate_list, cfg: ModelConfig):
        all_emb = jnp.concatenate(
            [params["item_emb"], params["cate_emb"][cate_list]], axis=-1)
        return all_emb, params["item_b"]

    @staticmethod
    def loss(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = BiLSTM.user_repr(params, batch, cate_list, cfg, use_pallas)
        i_emb, i_b = BiLSTM.item_repr(params, batch["i"], cate_list, cfg)
        logits = base.pointwise_logits(u, i_emb, i_b)
        l2 = base.l2_tables(params["user_emb"], params["item_emb"],
                            params["cate_emb"])
        return (base.sigmoid_ce_loss(logits, batch["y"], batch.get("valid"))
                + cfg.regulation_rate * l2)

    @staticmethod
    def pair_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = BiLSTM.user_repr(params, batch, cate_list, cfg, use_pallas)
        pe, pb = BiLSTM.item_repr(params, batch["i"], cate_list, cfg)
        ne, nb = BiLSTM.item_repr(params, batch["j"], cate_list, cfg)
        return (base.pointwise_logits(u, pe, pb),
                base.pointwise_logits(u, ne, nb))

    @staticmethod
    def eval_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = BiLSTM.user_repr(params, batch, cate_list, cfg, use_pallas)
        all_emb, all_b = BiLSTM.all_item_repr(params, cate_list, cfg)
        return base.full_catalog_logits(u, all_emb, all_b)
