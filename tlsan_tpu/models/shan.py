"""SHAN — Sequential Hierarchical Attention Network baseline.

Reference: SHAN/model.py:52-104, attention_net :271-321.  Pure-embedding
two-layer hierarchical attention in the 32-d item space:

  layer1: weight = softmax(u · sigmoid(pre·W1 + b1)ᵀ) over the long-term
          session items; long = Σ weight·pre          (:307-312)
  layer2: session = [current_session ∥ long]; weight = softmax(long ·
          sigmoid(session·W2 + b2)ᵀ); hybrid = Σ weight·session  (:314-321)

Deliberately preserved reference quirk: there is NO length masking — padded
positions (item id 0, a real item) participate in both softmaxes exactly as
in the reference.  BUT the reference pads each batch only to the PER-BATCH
max session length (SHAN/input.py:31-43), so an example of length n sees
(batch_max − n) pad slots in the softmax — a handful — whereas this
framework's static packing pads to the dataset max (data/batcher.py), which
until round 4 silently multiplied the pad-item softmax mass by ~an order of
magnitude and sank the envelopes 0.07–0.20 below published on the
long-tailed datasets (VERDICT r3 weak #1).  Softmax-weighted sums are
permutation-invariant over the key axis, so the reference semantics are
reproduced exactly under static shapes by limiting each softmax to the
first max(sl-in-batch) columns: the key multiset {items, pad×(batchmax−n),
(layer2: ∥ long)} then matches SHAN/model.py:307-321 per batch.  Measured:
runs/r4/fanout_*_shan8.json vs the unlimited r3 envelopes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import base
from tlsan_tpu.nn.embedding import lookup
from tlsan_tpu.nn.init import glorot_uniform


def _attention_layer(query, keys, w, b, n_cols=None, always_last=False):
    """softmax(query · sigmoid(keys·W + b)ᵀ) weighted sum of keys.

    query [B, E], keys [B, L, E] → [B, E]  (SHAN/model.py:307-312).

    n_cols (traced scalar) limits the softmax to the first n_cols key
    columns — the per-batch max the reference's dynamic padding produces
    (SHAN/input.py:31-43); columns inside the limit but past an example's
    own length stay UNMASKED (pad item 0 participates, the reference
    quirk).  always_last additionally keeps the final column (layer2's
    appended long-term vector, SHAN/model.py:314).
    """
    proj = jax.nn.sigmoid(
        jnp.einsum("ble,ef->blf", keys, w, precision="highest") + b)
    scores = jnp.einsum("be,ble->bl", query, proj, precision="highest")
    if n_cols is not None:
        cols = jnp.arange(keys.shape[1])
        live = cols < n_cols
        if always_last:
            live = live | (cols == keys.shape[1] - 1)
        scores = jnp.where(live[None, :], scores, -jnp.inf)
    weight = jax.nn.softmax(scores, axis=-1)
    return jnp.sum(keys * weight[:, :, None], axis=1)


class SHAN:
    name = "shan"
    # tables the reference regularizes as FULL variables (dense L2 grad;
    # the sparse train path decays these analytically): SHAN/model.py:131-136
    l2_full_tables = ("user_emb", "item_emb", "layer1_w", "layer2_w")

    @staticmethod
    def init_params(rng, cfg: ModelConfig):
        E = cfg.itemid_embedding_size
        k = jax.random.split(rng, 7)
        return {
            "item_emb": glorot_uniform(k[0], (cfg.item_count, E)),
            "item_b": jnp.zeros((cfg.item_count,), jnp.float32),
            "user_emb": glorot_uniform(k[1], (cfg.user_count, E)),
            # note: the reference's layer biases are [1, E] get_variables with
            # the default glorot initializer, not zeros (SHAN/model.py:72-77)
            "layer1_w": glorot_uniform(k[2], (E, E)),
            "layer1_b": glorot_uniform(k[3], (1, E)),
            "layer2_w": glorot_uniform(k[4], (E, E)),
            "layer2_b": glorot_uniform(k[5], (1, E)),
        }

    @staticmethod
    def user_repr(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u_emb = lookup(params["user_emb"], batch["u"])
        h = lookup(params["item_emb"], batch["hist_i"])
        h_new = lookup(params["item_emb"], batch["hist_i_new"])

        # per-batch dynamic-padding widths (SHAN/input.py:31-43); eval rows
        # padded by pad_to_multiple carry sl=0 and cannot raise the max
        lim1 = jnp.max(batch["sl"])
        lim2 = jnp.max(batch["sl_new"])
        long = _attention_layer(u_emb, h, params["layer1_w"],
                                params["layer1_b"], n_cols=lim1)
        session = jnp.concatenate([h_new, long[:, None, :]], axis=1)
        return _attention_layer(long, session, params["layer2_w"],
                                params["layer2_b"], n_cols=lim2,
                                always_last=True)

    @staticmethod
    def item_repr(params, ids, cate_list, cfg: ModelConfig):
        return lookup(params["item_emb"], ids), lookup(params["item_b"], ids)

    @staticmethod
    def all_item_repr(params, cate_list, cfg: ModelConfig):
        return params["item_emb"], params["item_b"]

    @staticmethod
    def loss(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u_t = SHAN.user_repr(params, batch, cate_list, cfg, use_pallas)
        i_emb, i_b = SHAN.item_repr(params, batch["i"], cate_list, cfg)
        logits = base.pointwise_logits(u_t, i_emb, i_b)
        # L2 over tables + attention weights (SHAN/model.py:131-136)
        l2 = base.l2_tables(params["user_emb"], params["item_emb"],
                            params["layer1_w"], params["layer2_w"])
        return (base.sigmoid_ce_loss(logits, batch["y"], batch.get("valid"))
                + cfg.regulation_rate * l2)

    @staticmethod
    def pair_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u_t = SHAN.user_repr(params, batch, cate_list, cfg, use_pallas)
        pe, pb = SHAN.item_repr(params, batch["i"], cate_list, cfg)
        ne, nb = SHAN.item_repr(params, batch["j"], cate_list, cfg)
        return (base.pointwise_logits(u_t, pe, pb),
                base.pointwise_logits(u_t, ne, nb))

    @staticmethod
    def eval_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u_t = SHAN.user_repr(params, batch, cate_list, cfg, use_pallas)
        all_emb, all_b = SHAN.all_item_repr(params, cate_list, cfg)
        return base.full_catalog_logits(u_t, all_emb, all_b)
