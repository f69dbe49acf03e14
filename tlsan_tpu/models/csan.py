"""CSAN– — directional self-attention (DiSAN-style) baseline, item-only
reduced variant as shipped in the reference ("CSAN–" column, README.md:30).

Reference: CSAN/model.py:51-85, attention_net :251-314,
directional_attention_with_dense :351-419, feature_wise_self_attention
:422-442, vanilla_attention :316-346.

Per block:
  - forward + backward directional attention: token-pair logits
    scaled_tanh(dependent + head + f_bias, 5) over [B,T,T,E], strict
    triangular direction masks, additive −|tᵢ−tⱼ| day-distance penalty,
    softmax over the attended axis then hard re-mask, sigmoid fusion gate
    between rep_map and the attention result;
  - feature-wise self-attention over concat(fw, bw) [B,T,2E] — elementwise
    soft·rep (keeps the time axis), then dense back to E;
  - readout: scaled-dot vanilla attention of the target item over the encoded
    sequence (mask applied before the 1/√E scale, as in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import base
from tlsan_tpu.nn.embedding import lookup
from tlsan_tpu.nn.init import glorot_uniform
from tlsan_tpu.nn.layers import dense, dropout
from tlsan_tpu.nn.masks import VERY_NEGATIVE_NUMBER, sequence_mask

KEY_MASK_VALUE = -(2.0 ** 32) + 1


def _scaled_tanh(x, scale=5.0):
    return scale * jnp.tanh(x / scale)


def _rng_iter(rng):
    """Yield independent subkeys (None forever when rng is None — eval or
    dropout 0, where nn.layers.dropout is a no-op)."""
    while True:
        if rng is None:
            yield None
        else:
            rng, sub = jax.random.split(rng)
            yield sub


def _directional_attention(x, rep_time, sl, p, forward: bool,
                           dropout_rate=0.0, rng=None):
    """One direction of DiSAN attention (CSAN/model.py:351-419).

    Dropout placement mirrors the reference exactly (train only):
    input-dropout before the map dense (bn_dense_layer keep_prob,
    CSAN/model.py:383), rep_map_dp feeding dependent/head (:385,391-392),
    and input-dropout inside both fusion-gate linears (:407-408).  The
    attention value (rep_map_tile) and the gate's convex combination use
    the UN-dropped rep_map, as in the reference."""
    B, T, E = x.shape
    rep_mask = sequence_mask(sl, T)  # [B, T]
    ks = _rng_iter(rng)

    rep_map = dense(dropout(x, dropout_rate, next(ks)),
                    p["map_w"], p["map_b"], jax.nn.relu)
    rep_map_dp = dropout(rep_map, dropout_rate, next(ks))
    dependent = dense(rep_map_dp, p["dep_w"])   # [B, T, E]
    head = dense(rep_map_dp, p["head_w"])       # [B, T, E]
    # logits[b, th, td, d] = scaled_tanh(dep[b,td,d] + head[b,th,d] + f_bias)
    logits = _scaled_tanh(
        dependent[:, None, :, :] + head[:, :, None, :] + p["f_bias"])

    r = jnp.arange(T)
    direct = (r[:, None] > r[None, :]) if forward else (r[:, None] < r[None, :])
    attn_mask = direct[None, :, :] & rep_mask[:, None, :]  # [B, T, T]
    # additive time-distance penalty −|tᵢ−tⱼ| (CSAN/model.py:376-378,:397)
    position = -jnp.abs(rep_time[:, :, None] - rep_time[:, None, :])

    logits = (logits
              + ((1.0 - attn_mask.astype(logits.dtype))
                 * VERY_NEGATIVE_NUMBER)[..., None]
              + position[..., None])
    score = jax.nn.softmax(logits, axis=2)
    score = score * attn_mask[..., None].astype(score.dtype)  # hard re-mask
    attn_result = jnp.einsum("bhcd,bcd->bhd", score, rep_map,
                             precision="highest")

    gate = jax.nn.sigmoid(
        dense(dropout(rep_map, dropout_rate, next(ks)),
              p["fus_i_w"], p["fus_i_b"])
        + dense(dropout(attn_result, dropout_rate, next(ks)),
                p["fus_a_w"], p["fus_a_b"])
        + p["o_bias"])
    out = gate * rep_map + (1.0 - gate) * attn_result
    return out * rep_mask[:, :, None].astype(out.dtype)


def _feature_wise_self_attention(x, sl, p, dropout_rate=0.0, rng=None):
    """Elementwise soft·rep over the time-masked softmax
    (CSAN/model.py:422-442 — output keeps the [B, T, 2E] shape).
    Input-dropout before both map denses (bn_dense_layer keep_prob,
    CSAN/model.py:429-432); the soft·rep product uses the un-dropped x."""
    T = x.shape[1]
    ks = _rng_iter(rng)
    m1 = dense(dropout(x, dropout_rate, next(ks)),
               p["w1"], p["b1"], jax.nn.relu)
    m2 = dense(dropout(m1, dropout_rate, next(ks)), p["w2"], p["b2"])
    mask = sequence_mask(sl, T)
    m2 = m2 + ((1.0 - mask.astype(m2.dtype)) * VERY_NEGATIVE_NUMBER)[:, :, None]
    soft = jax.nn.softmax(m2, axis=1)
    return soft * x


def _vanilla_attention(query, keys, sl):
    """Target-query readout; NOTE the reference masks at −2³²+1 *before* the
    1/√E scale (CSAN/model.py:328-340) — order preserved."""
    T, E = keys.shape[1], keys.shape[2]
    scores = jnp.einsum("be,bte->bt", query, keys, precision="highest")
    mask = sequence_mask(sl, T)
    scores = jnp.where(mask, scores, KEY_MASK_VALUE)
    scores = scores / (E ** 0.5)
    soft = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bt,bte->be", soft, keys, precision="highest")


def _dir_params(rng, E):
    k = jax.random.split(rng, 5)
    return {
        "map_w": glorot_uniform(k[0], (E, E)), "map_b": jnp.zeros((E,)),
        "dep_w": glorot_uniform(k[1], (E, E)),
        "head_w": glorot_uniform(k[2], (E, E)),
        "f_bias": jnp.zeros((E,)),
        "fus_i_w": glorot_uniform(k[3], (E, E)), "fus_i_b": jnp.zeros((E,)),
        "fus_a_w": glorot_uniform(k[4], (E, E)), "fus_a_b": jnp.zeros((E,)),
        "o_bias": jnp.zeros((E,)),
    }


class CSAN:
    name = "csan"
    # tables the reference regularizes as FULL variables (dense L2 grad;
    # the sparse train path decays these analytically): CSAN/model.py:112-114
    l2_full_tables = ("item_emb",)

    @staticmethod
    def init_params(rng, cfg: ModelConfig):
        E = cfg.itemid_embedding_size
        keys = jax.random.split(rng, 2 + 4 * cfg.num_blocks)
        ki = iter(range(len(keys)))
        params = {
            "item_emb": glorot_uniform(keys[next(ki)], (cfg.item_count, E)),
            "item_b": jnp.zeros((cfg.item_count,), jnp.float32),
            "blocks": [],
        }
        for _ in range(cfg.num_blocks):
            kf, kb, kw, kp = (keys[next(ki)], keys[next(ki)],
                              keys[next(ki)], keys[next(ki)])
            k1, k2 = jax.random.split(kw)
            params["blocks"].append({
                "fw": _dir_params(kf, E),
                "bw": _dir_params(kb, E),
                "fwsa": {
                    "w1": glorot_uniform(k1, (2 * E, 2 * E)),
                    "b1": jnp.zeros((2 * E,)),
                    "w2": glorot_uniform(k2, (2 * E, 2 * E)),
                    "b2": jnp.zeros((2 * E,)),
                },
                "proj_w": glorot_uniform(kp, (2 * E, E)),
                "proj_b": jnp.zeros((E,)),
            })
        return params

    @staticmethod
    def _encode_history(params, batch, cfg: ModelConfig = None):
        """Query-independent DiSAN encoder (run once per batch).  Dropout
        (reference CSAN/train.py --dropout, default 0.0) engages only when
        the batch carries a train-time dropout_rng."""
        enc = lookup(params["item_emb"], batch["hist_i"])
        sl, rep_time = batch["sl"], batch["hist_t"]
        rate = cfg.dropout if cfg is not None else 0.0
        rng = batch.get("dropout_rng") if rate > 0.0 else None
        ks = _rng_iter(rng)
        for blk in params["blocks"]:
            fw = _directional_attention(enc, rep_time, sl, blk["fw"], True,
                                        rate, next(ks))
            bw = _directional_attention(enc, rep_time, sl, blk["bw"], False,
                                        rate, next(ks))
            enc = _feature_wise_self_attention(
                jnp.concatenate([fw, bw], axis=-1), sl, blk["fwsa"],
                rate, next(ks))
            enc = dense(enc, blk["proj_w"], blk["proj_b"])
        return enc

    @staticmethod
    def _readout(params, enc, query, sl):
        dec = lookup(params["item_emb"], query)
        for _ in params["blocks"]:
            dec = _vanilla_attention(dec, enc, sl)
        return dec

    @staticmethod
    def user_repr(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        enc = CSAN._encode_history(params, batch, cfg)
        return CSAN._readout(params, enc, batch["i"], batch["sl"])

    @staticmethod
    def item_repr(params, ids, cate_list, cfg: ModelConfig):
        return lookup(params["item_emb"], ids), lookup(params["item_b"], ids)

    @staticmethod
    def all_item_repr(params, cate_list, cfg: ModelConfig):
        return params["item_emb"], params["item_b"]

    @staticmethod
    def loss(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = CSAN.user_repr(params, batch, cate_list, cfg, use_pallas)
        i_emb, i_b = CSAN.item_repr(params, batch["i"], cate_list, cfg)
        logits = base.pointwise_logits(u, i_emb, i_b)
        l2 = base.l2_tables(params["item_emb"])  # (CSAN/model.py:112-114)
        return (base.sigmoid_ce_loss(logits, batch["y"], batch.get("valid"))
                + cfg.regulation_rate * l2)

    @staticmethod
    def pair_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        # target-conditioned readout for pos and neg, but the DiSAN encoder
        # is query-independent and runs ONCE (the reference recomputes it in
        # two sess.runs)
        enc = CSAN._encode_history(params, batch, cfg)
        u_pos = CSAN._readout(params, enc, batch["i"], batch["sl"])
        u_neg = CSAN._readout(params, enc, batch["j"], batch["sl"])
        pe, pb = CSAN.item_repr(params, batch["i"], cate_list, cfg)
        ne, nb = CSAN.item_repr(params, batch["j"], cate_list, cfg)
        return (base.pointwise_logits(u_pos, pe, pb),
                base.pointwise_logits(u_neg, ne, nb))

    @staticmethod
    def eval_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = CSAN.user_repr(params, batch, cate_list, cfg, use_pallas)
        return base.full_catalog_logits(u, params["item_emb"], params["item_b"])
