"""Pallas FWA kernel vs. the jnp reference, in interpreter mode on CPU.
(The compiled-TPU equivalence run lives in the verify recipe; interpret mode
exercises the same kernel body.)"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import tlsan_tpu.ops.pallas.fwa as F
from tlsan_tpu.ops.feature_attention import feature_wise_attention_reference as ref


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        F.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def _mk(B, S, D, H, seed=0):
    rng = np.random.default_rng(seed)
    dh = D // H
    return (
        jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32),
        jnp.asarray(rng.integers(1, S + 1, B), jnp.int32),
        [jnp.asarray(rng.normal(size=(dh, dh)), jnp.float32) * 0.3,
         jnp.asarray(rng.normal(size=(dh,)), jnp.float32) * 0.1,
         jnp.asarray(rng.normal(size=(dh, dh)), jnp.float32) * 0.3,
         jnp.asarray(rng.normal(size=(dh,)), jnp.float32) * 0.1],
    )


@pytest.mark.parametrize("B,S", [(5, 10), (32, 17), (37, 10)])
def test_kernel_matches_reference(B, S):
    D, H = 64, 8
    x, lengths, ws = _mk(B, S, D, H)
    out = F.fwa_pallas(x, lengths, H, *ws)
    want = ref(x, lengths, H, *ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_vjp_matches_reference():
    x, lengths, ws = _mk(6, 10, 64, 8)
    g1 = jax.grad(lambda x, w: F.fwa_pallas(x, lengths, 8, w, *ws[1:]).sum(),
                  argnums=(0, 1))(x, ws[0])
    g2 = jax.grad(lambda x, w: ref(x, lengths, 8, w, *ws[1:]).sum(),
                  argnums=(0, 1))(x, ws[0])
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-5)


def test_block_diag():
    w = jnp.arange(4, dtype=jnp.float32).reshape(2, 2)
    bd = F._block_diag(w, 2)
    want = np.zeros((4, 4), np.float32)
    want[:2, :2] = np.asarray(w)
    want[2:, 2:] = np.asarray(w)
    np.testing.assert_array_equal(np.asarray(bd), want)
