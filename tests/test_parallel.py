"""Multi-chip path tests on the 8-virtual-device CPU mesh: explicit sharded
embedding gathers (fwd+bwd) and the full sharded train step vs. the
single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.models.tlsan import TLSAN
from tlsan_tpu.parallel.api import (
    make_sharded_train_step,
    shard_batch,
    shard_train_state,
)
from tlsan_tpu.parallel.mesh import make_mesh
from tlsan_tpu.parallel.sharded_embedding import sharded_lookup
from tlsan_tpu.train.state import make_optimizer


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=4, mp=2)


def test_sharded_lookup_matches_dense(mesh):
    V, D = 24, 16
    table = jnp.asarray(np.random.default_rng(0).normal(size=(V, D)),
                        dtype=jnp.float32)
    ids = jnp.asarray([0, 23, 7, 12, 3, 9, 15, 21], jnp.int32)
    out = sharded_lookup(mesh, table, ids)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(table)[np.asarray(ids)], rtol=1e-6)


def test_sharded_lookup_2d_ids(mesh):
    V, D = 16, 8
    table = jnp.arange(V * D, dtype=jnp.float32).reshape(V, D)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, V, (8, 5)), jnp.int32)
    out = sharded_lookup(mesh, table, ids)
    assert out.shape == (8, 5, D)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(ids)])


def test_sharded_lookup_grad_is_scatter_add(mesh):
    V, D = 16, 8
    table = jnp.asarray(np.random.default_rng(2).normal(size=(V, D)),
                        dtype=jnp.float32)
    ids = jnp.asarray([1, 1, 5, 9, 9, 9, 0, 15], jnp.int32)

    def loss(t):
        return jnp.sum(sharded_lookup(mesh, t, ids) ** 2)

    g = jax.grad(loss)(table)
    want = np.zeros((V, D), np.float32)
    for i in np.asarray(ids):
        want[i] += 2 * np.asarray(table)[i]
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5)


def _setup(B):
    import __graft_entry__ as ge
    return ge._tiny_setup(B=B)


def test_sharded_step_matches_single_device(mesh):
    cfg, params, batch, cate_list = _setup(B=32)
    tc = TrainConfig(learning_rate=0.1)
    opt = make_optimizer(tc)
    opt_state = opt.init(params)

    # single-device baseline
    def loss_fn(p, b):
        return TLSAN.loss(p, b, cate_list, cfg, use_pallas=False)

    loss0, grads = jax.value_and_grad(loss_fn)(params, batch)
    import optax
    updates, _ = opt.update(grads, opt_state, params)
    ref_params = optax.apply_updates(params, updates)

    # sharded step
    sp, so = shard_train_state(mesh, params, opt_state)
    sb = shard_batch(mesh, batch)
    step = make_sharded_train_step(TLSAN, cfg, tc, cate_list, mesh)
    sp, so, loss1 = step(sp, so, sb)

    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
