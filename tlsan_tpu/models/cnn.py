"""CNN (TextCNN) baseline.

Reference: CNN/model.py:45-93, cnn_net :285-334.  Same embedding+time front
as ATRank (item⊕cate + one-hot(12) time + dense), then: mask, zero-pad the
time axis to a fixed 500 (:299-301), 10 conv towers (filter heights 1..10 ×
32 filters, truncated-normal(0.1) weights, 0.1-constant bias, :306-318),
relu, max-pool over time (:320-324), concat to 320-d, dropout, dense to
hidden (:91).  Loss: mean sigmoid-CE + L2 over the item/cate tables
(:126-135).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import base
from tlsan_tpu.nn.embedding import item_cate_lookup, lookup
from tlsan_tpu.nn.init import glorot_uniform
from tlsan_tpu.nn.layers import dense
from tlsan_tpu.nn.masks import sequence_mask

N_TIME_BUCKETS = 12


def _truncated_normal(rng, shape, stddev=0.1):
    return stddev * jax.random.truncated_normal(rng, -2.0, 2.0, shape,
                                                jnp.float32)


class CNN:
    name = "cnn"
    # tables the reference regularizes as FULL variables (dense L2 grad;
    # the sparse train path decays these analytically): CNN/model.py:126-129
    l2_full_tables = ("item_emb", "cate_emb")

    @staticmethod
    def init_params(rng, cfg: ModelConfig):
        D = cfg.hidden_units
        keys = jax.random.split(rng, 4 + len(cfg.cnn_filter_sizes))
        ki = iter(range(len(keys)))
        params = {
            "item_emb": glorot_uniform(
                keys[next(ki)], (cfg.item_count, cfg.itemid_embedding_size)),
            "item_b": jnp.zeros((cfg.item_count,), jnp.float32),
            "cate_emb": glorot_uniform(
                keys[next(ki)], (cfg.cate_count, cfg.cateid_embedding_size)),
            # same time front as ATRank incl. the concat_time_emb switch
            # (CNN/model.py:69-77)
            "time_w": glorot_uniform(
                keys[next(ki)],
                ((cfg.itemid_embedding_size + cfg.cateid_embedding_size
                  + N_TIME_BUCKETS, D) if cfg.concat_time_emb else (1, D))),
            "time_b": jnp.zeros((D,), jnp.float32),
            "towers": [],
        }
        for fs in cfg.cnn_filter_sizes:
            params["towers"].append({
                # filter [fs, D, 1, num_filters] (CNN/model.py:309-311)
                "w": _truncated_normal(keys[next(ki)],
                                       (fs, D, 1, cfg.cnn_num_filters)),
                "b": jnp.full((cfg.cnn_num_filters,), 0.1, jnp.float32),
            })
        total = cfg.cnn_num_filters * len(cfg.cnn_filter_sizes)
        k_out = jax.random.fold_in(rng, 999)
        params["out_w"] = glorot_uniform(k_out, (total, D))
        params["out_b"] = jnp.zeros((D,), jnp.float32)
        return params

    @staticmethod
    def _embed_items(params, ids, cate_list):
        return item_cate_lookup(
            params["item_emb"], params["cate_emb"], ids, cate_list)

    @staticmethod
    def user_repr(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        h = CNN._embed_items(params, batch["hist_i"], cate_list)
        if cfg.concat_time_emb:
            t_onehot = jax.nn.one_hot(batch["hist_t"], N_TIME_BUCKETS,
                                      dtype=h.dtype)
            h = dense(jnp.concatenate([h, t_onehot], axis=-1),
                      params["time_w"], params["time_b"])
        else:
            t = batch["hist_t"].astype(h.dtype)[..., None]
            h = h + dense(t, params["time_w"], params["time_b"], jnp.tanh)

        B, T, D = h.shape
        mask = sequence_mask(batch["sl"], T).astype(h.dtype)
        h = h * mask[:, :, None]
        # The reference zero-pads the time axis to a fixed 500 before the
        # VALID convs (CNN/model.py:299-301).  Mathematically only windows
        # that touch a real row matter: every window fully inside the zero
        # pad evaluates to relu(0 + b), and padding to T + max(filter_sizes)
        # still leaves >=1 such all-zero window per tower (window at
        # position T covers rows T..T+fs-1, all zero), so the max-pool over
        # the shortened conv equals the max-pool over the 500-long conv
        # exactly.  That cuts the conv FLOPs ~ (500 / (T + 10)) ~ 5x at the
        # reference's T=90 (tests/test_all_models.py::test_cnn_short_window
        # checks equality against the literal padded-to-500 form).
        pad_len = min(cfg.cnn_pad_length, T + max(cfg.cnn_filter_sizes))
        h = jnp.pad(h, ((0, 0), (0, pad_len - T), (0, 0)))

        pooled = []
        for tw in params["towers"]:
            fs = tw["w"].shape[0]
            P = pad_len - fs + 1
            # im2col + matmul instead of lax.conv: each filter spans the
            # full feature width D, so the VALID conv is exactly a GEMM of
            # [B, P, fs*D] windows against [fs*D, F] — the MXU-native form,
            # and it stays a clean batched GEMM under the replica-fan-out
            # vmap (per-replica filters turn lax.conv into a grouped conv
            # XLA lowers poorly).  Same FLOPs, same f32 HIGHEST contraction.
            win = jnp.stack([h[:, k:k + P, :] for k in range(fs)], axis=2)
            conv = jnp.einsum("bpkd,kdf->bpf", win, tw["w"][:, :, 0, :],
                              precision=jax.lax.Precision.HIGHEST)
            act = jax.nn.relu(conv + tw["b"])       # [B, P, F]
            pooled.append(jnp.max(act, axis=1))     # max over time
        flat = jnp.concatenate(pooled, axis=-1)     # [B, 320]
        rng = batch.get("dropout_rng")
        if rng is not None and cfg.dropout > 0.0:
            # dropout on the pooled features (CNN/model.py:331-333)
            from tlsan_tpu.nn.layers import dropout
            flat = dropout(flat, cfg.dropout, rng)
        return dense(flat, params["out_w"], params["out_b"])

    @staticmethod
    def item_repr(params, ids, cate_list, cfg: ModelConfig):
        return CNN._embed_items(params, ids, cate_list), lookup(params["item_b"], ids)

    @staticmethod
    def all_item_repr(params, cate_list, cfg: ModelConfig):
        all_emb = jnp.concatenate(
            [params["item_emb"], params["cate_emb"][cate_list]], axis=-1)
        return all_emb, params["item_b"]

    @staticmethod
    def loss(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = CNN.user_repr(params, batch, cate_list, cfg, use_pallas)
        i_emb, i_b = CNN.item_repr(params, batch["i"], cate_list, cfg)
        logits = base.pointwise_logits(u, i_emb, i_b)
        l2 = base.l2_tables(params["item_emb"], params["cate_emb"])
        return (base.sigmoid_ce_loss(logits, batch["y"], batch.get("valid"))
                + cfg.regulation_rate * l2)

    @staticmethod
    def pair_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = CNN.user_repr(params, batch, cate_list, cfg, use_pallas)
        pe, pb = CNN.item_repr(params, batch["i"], cate_list, cfg)
        ne, nb = CNN.item_repr(params, batch["j"], cate_list, cfg)
        return (base.pointwise_logits(u, pe, pb),
                base.pointwise_logits(u, ne, nb))

    @staticmethod
    def eval_logits(params, batch, cate_list, cfg: ModelConfig, use_pallas=True):
        u = CNN.user_repr(params, batch, cate_list, cfg, use_pallas)
        all_emb, all_b = CNN.all_item_repr(params, cate_list, cfg)
        return base.full_catalog_logits(u, all_emb, all_b)
