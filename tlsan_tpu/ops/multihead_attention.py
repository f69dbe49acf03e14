"""Multi-head scaled-dot attention — ATRank's substrate.

Semantics (reference: ATRank/model.py:334-424 `multihead_attention`):
  - relu Q/K/V projections (:369-371);
  - heads split on features (batch-absorbed in the reference; reshape here —
    same ordering, see ops/feature_attention.py for the equivalence argument);
  - scaled dot-product, key-padding mask at −2³²+1 (:382-393);
  - softmax over keys, then query-mask zeroing (:398-404);
  - weighted sum, heads re-concatenated, residual += queries, LayerNorm
    (:413-422).

Shapes: queries [B, Tq, D], keys [B, Tk, D] → [B, Tq, D].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tlsan_tpu.nn.layers import dense, layer_norm
from tlsan_tpu.nn.masks import sequence_mask

KEY_MASK_VALUE = -(2.0 ** 32) + 1


def multihead_attention(queries, q_len, keys, k_len, num_heads, p,
                        dropout_rate: float = 0.0, rng=None):
    """p: dict with wq,bq,wk,bk,wv,bv [D,D]/[D] and ln_gamma,ln_beta [D].
    Train-time dropout lands on the attention probabilities
    (reference: ATRank/model.py:410)."""
    B, Tq, D = queries.shape
    Tk = keys.shape[1]
    dh = D // num_heads

    Q = dense(queries, p["wq"], p["bq"], jax.nn.relu)
    K = dense(keys, p["wk"], p["bk"], jax.nn.relu)
    V = dense(keys, p["wv"], p["bv"], jax.nn.relu)

    Qh = Q.reshape(B, Tq, num_heads, dh)
    Kh = K.reshape(B, Tk, num_heads, dh)
    Vh = V.reshape(B, Tk, num_heads, dh)

    scores = jnp.einsum("bqhd,bkhd->bhqk", Qh, Kh,
                        precision="highest") / (dh ** 0.5)
    key_mask = sequence_mask(k_len, Tk)[:, None, None, :]  # [B,1,1,Tk]
    scores = jnp.where(key_mask, scores, KEY_MASK_VALUE)
    soft = jax.nn.softmax(scores, axis=-1)
    # query-mask zeroing (ATRank/model.py:401-404)
    q_mask = sequence_mask(q_len, Tq).astype(soft.dtype)[:, None, :, None]
    soft = soft * q_mask

    if dropout_rate > 0.0 and rng is not None:
        from tlsan_tpu.nn.layers import dropout as _dropout
        soft = _dropout(soft, dropout_rate, rng)

    out = jnp.einsum("bhqk,bkhd->bqhd", soft, Vh, precision="highest")
    out = out.reshape(B, Tq, D)
    out = out + queries  # residual (:419)
    return layer_norm(out, p["ln_gamma"], p["ln_beta"]), soft


def feedforward(x, p):
    """Conv1d(kernel 1) FFN + residual + LayerNorm
    (reference: ATRank/model.py:426-459): relu dense to D/4 then linear back."""
    out = dense(x, p["w1"], p["b1"], jax.nn.relu)
    out = dense(out, p["w2"], p["b2"])
    out = out + x
    return layer_norm(out, p["ln_gamma"], p["ln_beta"])
