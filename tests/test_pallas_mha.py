"""Pallas MHA kernel vs the jnp reference (interpret mode; the compiled-TPU
equivalence + timing notes live in ops/pallas/mha.py's docstring)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import tlsan_tpu.ops.pallas.mha as M
from tlsan_tpu.models.atrank import _attn_params
from tlsan_tpu.ops.multihead_attention import multihead_attention as ref


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        M.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


@pytest.mark.parametrize("B,Tq,Tk", [(5, 12, 12), (4, 1, 10), (9, 7, 7)])
def test_mha_matches_reference(B, Tq, Tk):
    D, H = 64, 8
    rng = np.random.default_rng(0)
    p = _attn_params(jax.random.PRNGKey(0), D)
    q = jnp.asarray(rng.normal(size=(B, Tq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Tk, D)), jnp.float32)
    ql = jnp.asarray(rng.integers(1, Tq + 1, B), jnp.int32)
    kl = jnp.asarray(rng.integers(1, Tk + 1, B), jnp.int32)
    out = M.mha_pallas(q, k, ql, kl, H, p)
    want, _ = ref(q, ql, k, kl, H, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mha_vjp_matches_reference():
    B, T, D, H = 3, 8, 64, 8
    rng = np.random.default_rng(1)
    p = _attn_params(jax.random.PRNGKey(1), D)
    q = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    ql = jnp.asarray(rng.integers(1, T + 1, B), jnp.int32)
    g1 = jax.grad(lambda x: M.mha_pallas(x, x, ql, ql, H, p).sum())(q)
    g2 = jax.grad(lambda x: ref(x, ql, x, ql, H, p)[0].sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)
