"""Fused Pallas TPU kernel for ATRank-style multi-head attention.

Semantics = ops/multihead_attention.py (reference: ATRank/model.py:334-424):
relu Q/K/V projections, per-head scaled dot-product, key mask at −2³²+1,
softmax over keys, query-mask zeroing, weighted sum, residual + LayerNorm.

Fusion: one kernel reads queries/keys from HBM once per batch tile and
writes only the [TB, Tq, D] output — Q/K/V, the [H, Tq, Tk] score tensor and
the softmax never hit HBM.  The QKV projections are [TB·T, D]×[D, D] MXU
contractions (done as 3-D dot_general to avoid relayouts); per-head scores
run as dh-contractions with H static (unrolled, H=8).

Backward: custom VJP rematerializing through the jnp reference (identical
numerics), as with the FWA kernel.

MEASURED (round-2 chain-corrected sweep, TPU v5e, f32, D=64, H=8, T=90 —
RESULTS.md "Pallas question"): numerically exact (≤1e-6 vs the reference)
but the XLA path wins the forward at EVERY batch in {32, 512, 2048}
(e.g. 7.7 ms vs 9.0 ms at B=2048) and ties the backward — dh=8 pads to
128 lanes, wasting 16× of the VPU per head.  models/atrank.py therefore
uses XLA by default and `--pallas` is an explicit A/B switch (the old
auto-engage-at-B≥256 heuristic contradicted the measurements and was
removed).  Under a (dp, mp) mesh the kernel composes via shard_map over
dp (ops/pallas/sharded.py).  Re-evaluate against runs/bench_kernels_r2.txt
before enabling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KEY_MASK_VALUE = -(2.0 ** 32) + 1
_HIGHEST = jax.lax.Precision.HIGHEST


def _dot3(a, w):
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST)


def _mha_kernel(q_ref, k_ref, qlen_ref, klen_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                g_ref, beta_ref, out_ref, *, num_heads: int):
    TB, Tq, D = q_ref.shape
    Tk = k_ref.shape[1]
    dh = D // num_heads

    q_in = q_ref[:]
    k_in = k_ref[:]
    Q = jnp.maximum(_dot3(q_in, wq_ref[:]) + bq_ref[:], 0.0)
    K = jnp.maximum(_dot3(k_in, wk_ref[:]) + bk_ref[:], 0.0)
    V = jnp.maximum(_dot3(k_in, wv_ref[:]) + bv_ref[:], 0.0)

    kpos = jax.lax.broadcasted_iota(jnp.int32, (TB, Tk), 1)
    key_mask = kpos < klen_ref[:]          # [TB, Tk]
    qpos = jax.lax.broadcasted_iota(jnp.int32, (TB, Tq), 1)
    q_mask = (qpos < qlen_ref[:]).astype(jnp.float32)  # [TB, Tq]

    scale = 1.0 / (dh ** 0.5)
    # accumulate head outputs via static placement matmuls instead of a
    # concat — a concat keeps every head's intermediates live and blows the
    # scoped-VMEM stack at T=90; with accumulation each head's buffers die
    # at the end of its unrolled iteration
    eye = jnp.eye(D, dtype=jnp.float32)
    out = jnp.zeros((TB, Tq, D), jnp.float32)
    for h in range(num_heads):           # static unroll (H=8)
        qh = Q[:, :, h * dh:(h + 1) * dh]
        kh = K[:, :, h * dh:(h + 1) * dh]
        vh = V[:, :, h * dh:(h + 1) * dh]
        scores = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_HIGHEST) * scale
        scores = jnp.where(key_mask[:, None, :], scores, KEY_MASK_VALUE)
        mx = jnp.max(scores, axis=2, keepdims=True)
        e = jnp.exp(scores - mx)
        soft = e / jnp.sum(e, axis=2, keepdims=True)
        soft = soft * q_mask[:, :, None]
        oh = jax.lax.dot_general(
            soft, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_HIGHEST)
        out = out + _dot3(oh, eye[h * dh:(h + 1) * dh, :])

    # residual + LayerNorm (ATRank/model.py:419-422, :461-488)
    out = out + q_in
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(out - mean), axis=-1, keepdims=True)
    out_ref[:] = g_ref[:] * (out - mean) / jnp.sqrt(var + 1e-8) + beta_ref[:]


def _round_up(n, m):
    return ((n + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def mha_pallas(queries, keys, q_len, k_len, num_heads, p):
    return _mha_forward(queries, keys, q_len, k_len, num_heads, p)


def _mha_forward(queries, keys, q_len, k_len, num_heads, p):
    B, Tq, D = queries.shape
    Tk = keys.shape[1]
    # VMEM budget: Q/K/V + scores-per-head + in/out buffers
    vmem_budget = 3 * 1024 * 1024
    per_row = (6 * max(Tq, Tk) * _round_up(D, 128)
               + 2 * Tq * _round_up(Tk, 128)) * 4
    tb_cap = max(8, (vmem_budget // per_row) // 8 * 8)
    TB = min(_round_up(B, 8), 256, tb_cap)
    grid = (pl.cdiv(B, TB),)

    spec2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, num_heads=num_heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Tq, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Tk, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            spec2((D, D)), spec2((1, D)),
            spec2((D, D)), spec2((1, D)),
            spec2((D, D)), spec2((1, D)),
            spec2((1, D)), spec2((1, D)),
        ],
        out_specs=pl.BlockSpec((TB, Tq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tq, D), queries.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (3 * Tk * D * D + 2 * Tq * Tk * D),
            bytes_accessed=4 * B * (Tq * D * 2 + Tk * D),
            transcendentals=B * Tq * Tk,
        ),
    )(queries, keys,
      q_len.astype(jnp.int32)[:, None], k_len.astype(jnp.int32)[:, None],
      p["wq"], p["bq"][None, :], p["wk"], p["bk"][None, :],
      p["wv"], p["bv"][None, :], p["ln_gamma"][None, :], p["ln_beta"][None, :])
    return out


def _mha_fwd(queries, keys, q_len, k_len, num_heads, p):
    out = _mha_forward(queries, keys, q_len, k_len, num_heads, p)
    return out, (queries, keys, q_len, k_len, p)


def _mha_bwd(num_heads, res, g):
    from tlsan_tpu.ops.multihead_attention import multihead_attention

    queries, keys, q_len, k_len, p = res
    _, vjp = jax.vjp(
        lambda queries, keys, p: multihead_attention(
            queries, q_len, keys, k_len, num_heads, p)[0],
        queries, keys, p)
    dq, dk, dp = vjp(g)
    return dq, dk, None, None, dp


mha_pallas.defvjp(_mha_fwd, _mha_bwd)
