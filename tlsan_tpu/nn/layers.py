"""Shared layers: layer norm, TF-compatible LSTM as a lax.scan, helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, gamma, beta, eps: float = 1e-8):
    """LayerNorm over the last axis (reference: ATRank/model.py:461-488 —
    note the reference normalizes by moment variance with its own epsilon)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return gamma * (x - mean) / jnp.sqrt(var + eps) + beta


def dropout(x, rate: float, rng):
    """Inverted dropout (≡ tf.nn.dropout / tf.layers.dropout at train time).
    No-op when rate==0 or rng is None (eval)."""
    if rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def dense(x, w, b=None, activation=None):
    out = jnp.dot(x, w, precision="highest")
    if b is not None:
        out = out + b
    if activation is not None:
        out = activation(out)
    return out


def lstm_scan(x, w, b, hidden: int, forget_bias: float = 1.0):
    """TF-1.8 LSTMCell-compatible LSTM over [B, T, D] via lax.scan.

    Gate layout matches tf.nn.rnn_cell.LSTMCell: one kernel
    [D+H, 4H] applied to concat([x_t, h]), split into (i, j, f, o) with
    forget_bias added to f (reference: Bi-LSTM/model.py:197-205 builds the
    stock cell).  Returns outputs [B, T, H].
    """
    B = x.shape[0]

    def step(carry, x_t):
        c, h = carry
        z = jnp.dot(jnp.concatenate([x_t, h], axis=-1), w,
                    precision="highest") + b
        i, j, f, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (c, h), h

    init = (jnp.zeros((B, hidden), x.dtype), jnp.zeros((B, hidden), x.dtype))
    _, outs = jax.lax.scan(step, init, jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(outs, 0, 1)


def reverse_valid(x, lengths):
    """Reverse the first `lengths[b]` steps of each row, like
    tf.reverse_sequence (padding beyond the valid region keeps its place)."""
    T = x.shape[1]
    pos = jnp.arange(T)[None, :]
    idx = jnp.where(pos < lengths[:, None], lengths[:, None] - 1 - pos, pos)
    return jnp.take_along_axis(x, idx[..., None], axis=1) if x.ndim == 3 else (
        jnp.take_along_axis(x, idx, axis=1))


def gather_time(x, t):
    """x[b, t[b], :] (≡ reference extract_axis_1, Bi-LSTM/model.py:191-195)."""
    return jnp.take_along_axis(x, t[:, None, None], axis=1)[:, 0, :]
