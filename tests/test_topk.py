"""Distributed top-k vs. dense single-device top-k on the virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tlsan_tpu.parallel.mesh import make_mesh
from tlsan_tpu.parallel.topk import sharded_topk_scores


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=4, mp=2)


def test_sharded_topk_matches_dense(mesh):
    rng = np.random.default_rng(0)
    B, D, V, K = 8, 16, 40, 5
    u = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)), jnp.float32)

    vals, idx = sharded_topk_scores(mesh, u, emb, bias, K)
    dense = np.asarray(u) @ np.asarray(emb).T + np.asarray(bias)
    want_idx = np.argsort(-dense, axis=1)[:, :K]
    want_vals = np.take_along_axis(dense, want_idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_sharded_topk_no_bias(mesh):
    rng = np.random.default_rng(1)
    B, D, V, K = 4, 8, 16, 3
    u = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    vals, idx = sharded_topk_scores(mesh, u, emb, None, K)
    dense = np.asarray(u) @ np.asarray(emb).T
    want_idx = np.argsort(-dense, axis=1)[:, :K]
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
