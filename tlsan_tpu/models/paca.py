"""PACA — Position-Aware Context Attention baseline.

Reference: PACA/model.py:40-109, PositionAwareAttention :260-305.  No user id
at all: the user representation is built purely from the session.

  - position_w [kernel_size, max_len, E] (:44-46); per kernel
    score[t] = Σ_d sigmoid(h[t,d]) · w_p[kernel, t, d] (:286-292);
  - max over kernels (:294-295);
  - softmax over time of score·mask — note the reference softmaxes the
    *zero-masked* scores (padded slots contribute exp(0)), then re-masks and
    renormalizes over valid positions (:297-301) — reproduced exactly;
  - weighted sum → bilinear map linear_w (:307-319);
  - plain dot-product logits, NO item bias (:71-74).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import base
from tlsan_tpu.nn.embedding import lookup
from tlsan_tpu.nn.init import glorot_uniform
from tlsan_tpu.nn.masks import sequence_mask


class PACA:
    name = "paca"
    # tables the reference regularizes as FULL variables (dense L2 grad;
    # the sparse train path decays these analytically): PACA/model.py:100-103
    l2_full_tables = ("item_emb", "position_w")

    @staticmethod
    def init_params(rng, cfg: ModelConfig):
        E = cfg.itemid_embedding_size
        k = jax.random.split(rng, 3)
        return {
            "item_emb": glorot_uniform(k[0], (cfg.item_count, E)),
            "position_w": glorot_uniform(
                k[1], (cfg.paca_kernel_size, cfg.paca_max_len, E)),
            "linear_w": glorot_uniform(k[2], (E, E)),
        }

    @staticmethod
    def user_repr(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        h = lookup(params["item_emb"], batch["hist_i"])  # [B, T, E]
        rng = batch.get("dropout_rng")
        if rng is not None and cfg.dropout > 0.0:
            # dropout on the session embedding (PACA/model.py:272-273)
            from tlsan_tpu.nn.layers import dropout
            rng, k1 = jax.random.split(rng)
            h = dropout(h, cfg.dropout, k1)
        T = h.shape[1]
        mask = sequence_mask(batch["sl"], T).astype(h.dtype)  # [B, T]
        h = h * mask[:, :, None]
        tmp = jax.nn.sigmoid(h)  # sigmoid of the *masked* emb (quirk kept)

        wp = params["position_w"][:, :T, :]  # [K, T, E]
        # score[k, b, t] = Σ_d tmp[b,t,d] · wp[k,t,d]
        scores = jnp.einsum("btd,ktd->kbt", tmp, wp, precision="highest")
        sim = jnp.max(scores, axis=0)  # [B, T]

        # reference softmaxes sim·mask (padded → exp(0)), then re-masks and
        # renormalizes (PACA/model.py:297-301)
        att = jax.nn.softmax(sim * mask, axis=1) * mask
        att = att / jnp.maximum(jnp.sum(att, axis=1, keepdims=True), 1e-20)
        paa = jnp.sum(h * att[:, :, None], axis=1)  # [B, E]
        if rng is not None and cfg.dropout > 0.0:
            # dropout before the bilinear map (PACA/model.py:315-316)
            from tlsan_tpu.nn.layers import dropout
            paa = dropout(paa, cfg.dropout, rng)
        return jnp.dot(paa, params["linear_w"], precision="highest")

    @staticmethod
    def item_repr(params, ids, cate_list, cfg: ModelConfig):
        return lookup(params["item_emb"], ids), None

    @staticmethod
    def all_item_repr(params, cate_list, cfg: ModelConfig):
        return params["item_emb"], None

    @staticmethod
    def loss(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = PACA.user_repr(params, batch, cate_list, cfg)
        i_emb, _ = PACA.item_repr(params, batch["i"], cate_list, cfg)
        logits = base.pointwise_logits(u, i_emb)
        l2 = base.l2_tables(params["item_emb"], params["position_w"])
        return (base.sigmoid_ce_loss(logits, batch["y"], batch.get("valid"))
                + cfg.regulation_rate * l2)

    @staticmethod
    def pair_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = PACA.user_repr(params, batch, cate_list, cfg)
        hi, _ = PACA.item_repr(params, batch["i"], cate_list, cfg)
        hj, _ = PACA.item_repr(params, batch["j"], cate_list, cfg)
        return jnp.sum(u * hi, 1), jnp.sum(u * hj, 1)

    @staticmethod
    def eval_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = PACA.user_repr(params, batch, cate_list, cfg)
        return base.full_catalog_logits(u, params["item_emb"], None)
