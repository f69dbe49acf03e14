"""Sparse (touched-row) SGD parity vs the dense optax path.

Drives both train-chunk implementations over the same real packed data
(Clothing_Shoes_and_Jewelry) and asserts every parameter matches within
float-associativity tolerance after dozens of steps — including the
global-norm clip (active early at lr=1.0) and the full-table L2 decay
(TLSAN/SHAN/... families) the sparse path applies analytically.
"""

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.models import get_model
from tlsan_tpu.train import sparse
from tlsan_tpu.train.cli import prepare
from tlsan_tpu.train.state import lr_schedule, make_optimizer

DATA = "/root/reference/Data/Clothing_Shoes_and_Jewelry.pkl"

ALL_MODELS = ["tlsan", "atrank", "shan", "csan", "lspm",
              "paca", "cnn", "bilstm", "bpr"]


def _setup(model_name, B=8, steps=30, seed=7):
    cfg = ModelConfig(model=model_name)
    tc = TrainConfig(train_batch_size=B, optimizer="sgd",
                     lr_drop_step=20)  # exercise the LR drop mid-run
    train_b, _, cate_list, cfg = prepare(model_name, DATA, cfg)
    data = {k: jnp.asarray(v[: 4 * B * steps]) for k, v in train_b.arrays.items()}
    n = len(next(iter(data.values())))
    rng = np.random.default_rng(seed)
    idx = jnp.asarray(rng.integers(0, n, size=(steps, B)), jnp.int32)
    model = get_model(model_name)
    params = model.init_params(jax.random.PRNGKey(1234), cfg)
    return model, cfg, tc, data, jnp.asarray(cate_list), idx, params


def _dense_chunk(model, cfg, tc, cate_list, data):
    """The dense optax step, mirroring train/loop.py."""
    opt = make_optimizer(tc)

    def loss_fn(params, batch):
        return model.loss(params, batch, cate_list, cfg, False)

    @jax.jit
    def chunk(params, idx):
        opt_state = opt.init(params)

        def step(carry, ib):
            params, opt_state = carry
            batch = {k: v[ib] for k, v in data.items()}
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(step, (params, opt_state), idx)
        return params, losses

    return chunk


@pytest.mark.parametrize("model_name", ALL_MODELS)
def test_sparse_matches_dense(model_name):
    model, cfg, tc, data, cate_list, idx, params = _setup(model_name)
    assert sparse.sparsifiable(params, data), model_name

    dense = _dense_chunk(model, cfg, tc, cate_list, data)
    p_dense, losses_dense = dense(
        jax.tree_util.tree_map(jnp.copy, params), idx)

    chunk = sparse.make_sparse_chunk(
        model, cfg, tc, cate_list, data, params, False, lr_schedule(tc))
    p_sparse, _, loss_sparse = chunk(
        jax.tree_util.tree_map(jnp.copy, params),
        jnp.asarray(0, jnp.int32), idx, jax.random.PRNGKey(0), data)

    flat_d = jax.tree_util.tree_leaves_with_path(p_dense)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(p_sparse))
    for path, leaf_d in flat_d:
        leaf_s = flat_s[path]
        np.testing.assert_allclose(
            np.asarray(leaf_s), np.asarray(leaf_d), rtol=2e-3, atol=2e-5,
            err_msg=f"{model_name} param {jax.tree_util.keystr(path)}")
    # mean chunk loss (incl. the analytic untouched-row L2 mass) matches
    np.testing.assert_allclose(float(loss_sparse),
                               float(jnp.mean(losses_dense)),
                               rtol=1e-3)


def test_sparse_clip_active():
    """The global-norm clip must fire identically on both paths (TLSAN at
    lr=1.0 exceeds max_norm=5 early)."""
    model, cfg, tc, data, cate_list, idx, params = _setup("tlsan", steps=5)
    tc = dataclasses.replace(tc, max_gradient_norm=0.05)  # always clipping
    dense = _dense_chunk(model, cfg, tc, cate_list, data)
    p_dense, _ = dense(jax.tree_util.tree_map(jnp.copy, params), idx)
    chunk = sparse.make_sparse_chunk(
        model, cfg, tc, cate_list, data, params, False, lr_schedule(tc))
    p_sparse, _, _ = chunk(jax.tree_util.tree_map(jnp.copy, params),
                           jnp.asarray(0, jnp.int32), idx,
                           jax.random.PRNGKey(0), data)
    for path, leaf_d in jax.tree_util.tree_leaves_with_path(p_dense):
        leaf_s = dict(jax.tree_util.tree_leaves_with_path(p_sparse))[path]
        np.testing.assert_allclose(np.asarray(leaf_s), np.asarray(leaf_d),
                                   rtol=2e-4, atol=2e-6)
