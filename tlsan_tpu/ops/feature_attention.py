"""Feature-wise multi-head attention — TLSAN's core op.

Semantics (reference: TLSAN/model.py:370-394 `feature_wise_attention`):
  - split the feature axis into H heads (the *batch* absorbs heads in the
    reference via split/concat; here a reshape — provably the same feature
    ordering);
  - two per-head dense maps sharing weights across heads and batch:
    map1 = relu(x·W1 + b1), map2 = map1·W2 + b2   (bn_dense_layer with
    enable_bn=False as called at :380-383);
  - additive −1e30 mask on padded time positions (:384, exp_mask :480-483);
  - softmax over the TIME axis per feature (:386);
  - weighted sum over time, heads re-concatenated on features (:387-388).

Shapes: x [B, S, D], lengths [B] → out [B, D], soft [B, S, H, D/H].

The W1/W2 maps are [D/H, D/H] (8×8 at the default D=64, H=8) — far below MXU
tile size, so the profitable fusion target is not the matmul but the memory
traffic: one fused kernel reads x once and produces the [B, D] output without
materializing map1/map2/soft in HBM.  `feature_wise_attention` dispatches to
the fused Pallas kernel on TPU (ops/pallas/fwa.py) and falls back to the jnp
reference elsewhere; both share this file's semantics and are cross-checked
in tests/test_ops.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tlsan_tpu.nn.masks import additive_neg_mask, sequence_mask


def feature_wise_attention_reference(x, lengths, num_heads, w1, b1, w2, b2,
                                     return_soft: bool = False,
                                     dropout_rate: float = 0.0, rng=None):
    """Pure-jnp reference implementation (the correctness oracle)."""
    B, S, D = x.shape
    dh = D // num_heads
    x4 = x.reshape(B, S, num_heads, dh)
    # dropout (train-time, rate>0) lands on the input of each dense map —
    # the reference's linear(keep_prob) semantics (TLSAN/model.py:428-431)
    x_in, k2 = x4, None
    if dropout_rate > 0.0 and rng is not None:
        from tlsan_tpu.nn.layers import dropout as _dropout
        k1, k2 = jax.random.split(rng)
        x_in = _dropout(x4, dropout_rate, k1)
    # precision='highest': keep the tiny [dh,dh] maps in true f32 — the
    # session default truncates matmul inputs to bf16, and at 8×8 the MXU
    # saving is nil while the reference (TF f32) semantics matter
    m1 = jax.nn.relu(
        jnp.einsum("bshd,de->bshe", x_in, w1, precision="highest") + b1)
    m1_in = m1
    if k2 is not None:
        from tlsan_tpu.nn.layers import dropout as _dropout
        m1_in = _dropout(m1, dropout_rate, k2)
    m2 = jnp.einsum("bshd,de->bshe", m1_in, w2, precision="highest") + b2
    mask = sequence_mask(lengths, S)  # [B, S]
    m2 = additive_neg_mask(m2, mask[:, :, None, None])
    soft = jax.nn.softmax(m2, axis=1)
    out = jnp.sum(soft * x4, axis=1).reshape(B, D)
    if return_soft:
        return out, soft
    return out


def feature_wise_attention(x, lengths, num_heads, w1, b1, w2, b2,
                           use_pallas: bool = True,
                           dropout_rate: float = 0.0, rng=None):
    """Fused feature-wise attention; Pallas on TPU, jnp elsewhere.
    Dropout (train-time only; every reference flag table defaults it to 0)
    routes through the jnp path."""
    if (dropout_rate <= 0.0 or rng is None) and use_pallas \
            and x.dtype == jnp.float32 \
            and jax.default_backend() == "tpu":
        from tlsan_tpu.nn import embedding
        from tlsan_tpu.ops.pallas.fwa import fwa_pallas

        mesh = embedding.current_batch_mesh()
        if mesh is not None:
            # mesh run: shard_map the kernel over dp (ops/pallas/sharded.py)
            from tlsan_tpu.ops.pallas.sharded import shard_map_batch_op
            return shard_map_batch_op(
                mesh,
                lambda x, l, w1, b1, w2, b2: fwa_pallas(
                    x, l, num_heads, w1, b1, w2, b2),
                x, lengths, w1, b1, w2, b2)
        return fwa_pallas(x, lengths, num_heads, w1, b1, w2, b2)
    return feature_wise_attention_reference(
        x, lengths, num_heads, w1, b1, w2, b2,
        dropout_rate=dropout_rate, rng=rng)
