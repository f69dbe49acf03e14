"""ATRank — attention-based user behavior modeling baseline.

Reference: ATRank/model.py:46-104, attention_net :288-331.

  - item⊕cate embedding + one-hot(12) time bucket concat + dense to
    hidden_units (:59-73, the default concat_time_emb=True path; the False
    path feeds an int placeholder into a dense — a reference dtype bug — and
    is implemented here with the natural float cast);
  - num_blocks × (multi-head self-attention + FFN) over the history (:291-308);
  - readout: the TARGET ITEM is the query of a 1-step vanilla attention over
    the encoded history + FFN (:310-328) — so the user representation is
    conditioned on the candidate item, including at full-catalog eval
    (reference quirk preserved: eval scores all items with the
    positive-item-conditioned representation, :100-104).

Batch: u, i, y, hist_i [B,T], hist_t [B,T] (int buckets 0..12), sl (+j at
eval).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import base
from tlsan_tpu.nn.embedding import item_cate_lookup, lookup
from tlsan_tpu.nn.init import glorot_uniform
from tlsan_tpu.nn.layers import dense
from tlsan_tpu.ops.multihead_attention import feedforward, multihead_attention

N_TIME_BUCKETS = 12  # one-hot width (ATRank/model.py:71)


def _attn_params(rng, D):
    k = jax.random.split(rng, 5)
    return {
        "wq": glorot_uniform(k[0], (D, D)), "bq": jnp.zeros((D,)),
        "wk": glorot_uniform(k[1], (D, D)), "bk": jnp.zeros((D,)),
        "wv": glorot_uniform(k[2], (D, D)), "bv": jnp.zeros((D,)),
        "ln_gamma": jnp.ones((D,)), "ln_beta": jnp.zeros((D,)),
    }


def _ffn_params(rng, D):
    k = jax.random.split(rng, 2)
    return {
        "w1": glorot_uniform(k[0], (D, D // 4)), "b1": jnp.zeros((D // 4,)),
        "w2": glorot_uniform(k[1], (D // 4, D)), "b2": jnp.zeros((D,)),
        "ln_gamma": jnp.ones((D,)), "ln_beta": jnp.zeros((D,)),
    }


class ATRank:
    name = "atrank"
    # tables the reference regularizes as FULL variables (dense L2 grad;
    # the sparse train path decays these analytically): row-L2 only, ATRank/model.py:130-133
    l2_full_tables = ()

    @staticmethod
    def init_params(rng, cfg: ModelConfig):
        D = cfg.hidden_units
        keys = jax.random.split(rng, 4 + 4 * cfg.num_blocks)
        ki = iter(range(len(keys)))
        params = {
            "item_emb": glorot_uniform(
                keys[next(ki)], (cfg.item_count, cfg.itemid_embedding_size)),
            "item_b": jnp.zeros((cfg.item_count,), jnp.float32),
            "cate_emb": glorot_uniform(
                keys[next(ki)], (cfg.cate_count, cfg.cateid_embedding_size)),
            # time-concat projection (ATRank/model.py:73); the
            # concat_time_emb=False path instead adds a tanh-dense of the
            # raw bucket (ATRank/model.py:75-78 — int→dense dtype bug in the
            # reference; we cast to float)
            "time_w": glorot_uniform(
                keys[next(ki)],
                ((cfg.itemid_embedding_size + cfg.cateid_embedding_size
                  + N_TIME_BUCKETS, D) if cfg.concat_time_emb else (1, D))),
            "time_b": jnp.zeros((D,), jnp.float32),
            "self_blocks": [], "vanilla_blocks": [],
        }
        for _ in range(cfg.num_blocks):
            k1, k2 = jax.random.split(keys[next(ki)])
            params["self_blocks"].append(
                {"attn": _attn_params(k1, D), "ffn": _ffn_params(k2, D)})
            k1, k2 = jax.random.split(keys[next(ki)])
            params["vanilla_blocks"].append(
                {"attn": _attn_params(k1, D), "ffn": _ffn_params(k2, D)})
        return params

    @staticmethod
    def _embed_items(params, ids, cate_list):
        return item_cate_lookup(
            params["item_emb"], params["cate_emb"], ids, cate_list)

    @staticmethod
    def _encode_history(params, batch, cate_list, cfg, use_pallas=False):
        """Query-independent self-attention encoding of the history; the
        readout below conditions on a candidate item.  Split so pairwise
        eval encodes ONCE for both the pos and neg queries."""
        h = ATRank._embed_items(params, batch["hist_i"], cate_list)
        if cfg.concat_time_emb:
            t_onehot = jax.nn.one_hot(batch["hist_t"], N_TIME_BUCKETS,
                                      dtype=h.dtype)
            h = dense(jnp.concatenate([h, t_onehot], axis=-1),
                      params["time_w"], params["time_b"])
        else:
            t = batch["hist_t"].astype(h.dtype)[..., None]
            h = h + dense(t, params["time_w"], params["time_b"], jnp.tanh)
        sl = batch["sl"]

        rng = batch.get("dropout_rng")

        def next_rng():
            nonlocal rng
            if rng is None or cfg.dropout <= 0.0:
                return None
            rng, sub = jax.random.split(rng)
            return sub

        # fused Pallas attention (ops/pallas/mha.py — exact vs the jnp
        # path, tests/test_pallas_mha.py) engages whenever --pallas is on
        # and no attention-prob dropout is needed.  Round-2 chain-corrected
        # measurements (runs/bench_kernels_r2.txt, RESULTS.md): the XLA
        # path wins the forward at EVERY batch in {32, 512, 2048} and ties
        # the backward, so --pallas stays an explicit A/B switch, not a
        # default — the old "auto-engage at B>=256" heuristic contradicted
        # the measurements and is gone.
        # (a dropout-trained cfg still fuses at inference, where no
        # dropout_rng is supplied and the jnp path is deterministic anyway)
        no_dropout = cfg.dropout <= 0.0 or batch.get("dropout_rng") is None
        # the Pallas kernels are f32-only; bf16 mixed precision routes
        # through the jnp/XLA path (the measured production default anyway)
        fused = use_pallas and no_dropout and h.dtype == jnp.float32
        mha_fused = ATRank._fused_mha(cfg) if fused else None

        enc = h
        for blk in params["self_blocks"]:
            if fused:
                enc = mha_fused(enc, enc, sl, sl, blk["attn"])
            else:
                enc, _ = multihead_attention(enc, sl, enc, sl,
                                             cfg.num_heads, blk["attn"],
                                             cfg.dropout, next_rng())
            enc = feedforward(enc, blk["ffn"])
        return enc, fused, next_rng

    @staticmethod
    def _fused_mha(cfg):
        """Pallas MHA, shard_mapped over dp when a mesh is active
        (ops/pallas/sharded.py) — single-device pallas_call otherwise."""
        from tlsan_tpu.nn import embedding
        from tlsan_tpu.ops.pallas.mha import mha_pallas
        mesh = embedding.current_batch_mesh()
        if mesh is not None:
            from tlsan_tpu.ops.pallas.sharded import mha_sharded
            return (lambda q, k, ql, kl, p:
                    mha_sharded(mesh, q, k, ql, kl, cfg.num_heads, p))
        return (lambda q, k, ql, kl, p:
                mha_pallas(q, k, ql, kl, cfg.num_heads, p))

    @staticmethod
    def _readout(params, enc, query_items, batch, cate_list, cfg,
                 fused, next_rng):
        """1-query vanilla attention of the candidate item over the encoded
        history (ATRank/model.py:310-328)."""
        sl = batch["sl"]
        i_emb = ATRank._embed_items(params, query_items, cate_list)
        dec = i_emb[:, None, :]
        ones = jnp.ones_like(sl)
        for blk in params["vanilla_blocks"]:
            if fused:
                dec = ATRank._fused_mha(cfg)(dec, enc, ones, sl, blk["attn"])
            else:
                dec, _ = multihead_attention(dec, ones, enc, sl,
                                             cfg.num_heads, blk["attn"],
                                             cfg.dropout, next_rng())
            dec = feedforward(dec, blk["ffn"])
        return dec[:, 0, :]

    @staticmethod
    def _user_repr_for(params, query_items, batch, cate_list, cfg,
                       use_pallas=False):
        enc, fused, next_rng = ATRank._encode_history(
            params, batch, cate_list, cfg, use_pallas)
        return ATRank._readout(params, enc, query_items, batch, cate_list,
                               cfg, fused, next_rng)

    @staticmethod
    def user_repr(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        return ATRank._user_repr_for(params, batch["i"], batch, cate_list, cfg,
                                     use_pallas)

    @staticmethod
    def item_repr(params, ids, cate_list, cfg: ModelConfig):
        return ATRank._embed_items(params, ids, cate_list), lookup(params["item_b"], ids)

    @staticmethod
    def all_item_repr(params, cate_list, cfg: ModelConfig):
        all_emb = jnp.concatenate(
            [params["item_emb"], params["cate_emb"][cate_list]], axis=-1)
        return all_emb, params["item_b"]

    @staticmethod
    def loss(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = ATRank.user_repr(params, batch, cate_list, cfg, use_pallas)
        i_emb, i_b = ATRank.item_repr(params, batch["i"], cate_list, cfg)
        logits = base.pointwise_logits(u, i_emb, i_b)
        # batch-level L2 over the user output and item embedding
        # (ATRank/model.py:130-133)
        valid = batch.get("valid")
        if valid is None:
            l2 = base.l2_tables(u, i_emb)
        else:
            v = valid.astype(jnp.float32)[:, None]
            l2 = 0.5 * (jnp.sum(jnp.square(u) * v) + jnp.sum(jnp.square(i_emb) * v))
        return (base.sigmoid_ce_loss(logits, batch["y"], valid)
                + cfg.regulation_rate * l2)

    @staticmethod
    def pair_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        # the readout is query-conditioned, so pos and neg each get their own
        # vanilla-attention readout — but the self-attention encoder is
        # query-independent and runs ONCE (the reference recomputes it in two
        # separate sess.runs, ATRank/model.py:253-282)
        enc, fused, next_rng = ATRank._encode_history(
            params, batch, cate_list, cfg, use_pallas)
        u_pos = ATRank._readout(params, enc, batch["i"], batch, cate_list,
                                cfg, fused, next_rng)
        u_neg = ATRank._readout(params, enc, batch["j"], batch, cate_list,
                                cfg, fused, next_rng)
        pe, pb = ATRank.item_repr(params, batch["i"], cate_list, cfg)
        ne, nb = ATRank.item_repr(params, batch["j"], cate_list, cfg)
        return (base.pointwise_logits(u_pos, pe, pb),
                base.pointwise_logits(u_neg, ne, nb))

    @staticmethod
    def eval_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = ATRank.user_repr(params, batch, cate_list, cfg, use_pallas)
        all_emb, all_b = ATRank.all_item_repr(params, cate_list, cfg)
        return base.full_catalog_logits(u, all_emb, all_b)
