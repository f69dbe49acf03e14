"""Feature-wise attention op vs. an independent pure-numpy oracle that walks
the reference graph literally: per-head split via concat-on-batch
(TLSAN/model.py:374), dense maps, additive mask, softmax over time, weighted
sum, concat heads (:386-388)."""

import numpy as np
import jax
import jax.numpy as jnp

from tlsan_tpu.ops.feature_attention import feature_wise_attention_reference


def numpy_oracle(x, lengths, num_heads, w1, b1, w2, b2):
    B, S, D = x.shape
    dh = D // num_heads
    # tf.concat(tf.split(x, H, axis=2), axis=0): head h occupies rows h*B..(h+1)*B
    xh = np.concatenate([x[:, :, h * dh:(h + 1) * dh] for h in range(num_heads)], axis=0)
    mask = np.arange(S)[None, :] < np.tile(lengths, num_heads)[:, None]
    m1 = np.maximum(xh @ w1 + b1, 0.0)
    m2 = m1 @ w2 + b2
    m2 = m2 + (1.0 - mask[:, :, None]) * -1e30
    e = np.exp(m2 - m2.max(axis=1, keepdims=True))
    soft = e / e.sum(axis=1, keepdims=True)
    out = (soft * xh).sum(axis=1)  # [H*B, dh]
    return np.concatenate([out[h * B:(h + 1) * B] for h in range(num_heads)], axis=1)


def test_fwa_matches_numpy_oracle():
    rng = np.random.default_rng(42)
    B, S, D, H = 5, 7, 64, 8
    x = rng.normal(size=(B, S, D)).astype(np.float32)
    lengths = np.array([1, 3, 7, 5, 2], np.int32)
    dh = D // H
    w1 = rng.normal(size=(dh, dh)).astype(np.float32) * 0.3
    b1 = rng.normal(size=(dh,)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(dh, dh)).astype(np.float32) * 0.3
    b2 = rng.normal(size=(dh,)).astype(np.float32) * 0.1

    got = feature_wise_attention_reference(
        jnp.asarray(x), jnp.asarray(lengths), H, w1, b1, w2, b2)
    want = numpy_oracle(x, lengths, H, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_fwa_padding_invariance():
    """Items beyond the valid length must not affect the output."""
    rng = np.random.default_rng(0)
    B, S, D, H = 4, 6, 32, 8
    x = rng.normal(size=(B, S, D)).astype(np.float32)
    lengths = np.array([2, 4, 6, 1], np.int32)
    dh = D // H
    w = [rng.normal(size=(dh, dh)).astype(np.float32),
         np.zeros(dh, np.float32),
         rng.normal(size=(dh, dh)).astype(np.float32),
         np.zeros(dh, np.float32)]
    out1 = feature_wise_attention_reference(jnp.asarray(x), jnp.asarray(lengths), H, *w)
    x2 = x.copy()
    for b in range(B):
        x2[b, lengths[b]:] = rng.normal(size=(S - lengths[b], D))
    out2 = feature_wise_attention_reference(jnp.asarray(x2), jnp.asarray(lengths), H, *w)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-6)


def test_fwa_differentiable():
    B, S, D, H = 2, 5, 16, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    lengths = jnp.asarray([3, 5], dtype=jnp.int32)
    dh = D // H
    w1 = jnp.asarray(rng.normal(size=(dh, dh)).astype(np.float32))
    g = jax.grad(lambda w: feature_wise_attention_reference(
        x, lengths, H, w, jnp.zeros(dh), jnp.eye(dh), jnp.zeros(dh)).sum())(w1)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
