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
from tlsan_tpu.data.batcher import Batches
from tlsan_tpu.models import get_model
from tlsan_tpu.train import sparse
from tlsan_tpu.train.cli import prepare
from tlsan_tpu.train import state as state_mod
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
    """The dense optax step, mirroring train/loop.py (incl. its bf16 gate)."""
    opt = make_optimizer(tc)
    bf16 = state_mod.wants_bf16(tc)

    def loss_fn(params, batch):
        if bf16:
            params, batch = state_mod.bf16_cast(params), state_mod.bf16_cast(batch)
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

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), idx)
        return params, opt_state, losses

    return chunk


def _assert_tree_close(got, want, rtol, atol, tag=""):
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(got))
    for path, leaf_w in flat_w:
        np.testing.assert_allclose(
            np.asarray(flat_g[path]), np.asarray(leaf_w), rtol=rtol,
            atol=atol, err_msg=f"{tag} {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("model_name", ALL_MODELS)
def test_sparse_matches_dense(model_name):
    model, cfg, tc, data, cate_list, idx, params = _setup(model_name)
    assert sparse.sparsifiable(params, data), model_name

    dense = _dense_chunk(model, cfg, tc, cate_list, data)
    p_dense, _, losses_dense = dense(
        jax.tree_util.tree_map(jnp.copy, params), idx)

    chunk = sparse.make_sparse_chunk(
        model, cfg, tc, cate_list, data, params, False, lr_schedule(tc))
    p_sparse, _, loss_sparse = chunk(
        jax.tree_util.tree_map(jnp.copy, params),
        jnp.asarray(0, jnp.int32), idx, jax.random.PRNGKey(0), data)

    _assert_tree_close(p_sparse, p_dense, rtol=2e-3, atol=2e-5,
                       tag=model_name)
    # mean chunk loss (incl. the analytic untouched-row L2 mass) matches
    np.testing.assert_allclose(float(loss_sparse),
                               float(jnp.mean(losses_dense)),
                               rtol=1e-3)


@pytest.mark.parametrize("model_name", ALL_MODELS)
def test_sparse_adam_matches_dense(model_name):
    """Scatter-moment Adam (make_sparse_adam_chunk) equals the dense
    optax.chain(clip, adam(schedule)) step — params AND final moments —
    across the LR drop and the early active clip."""
    model, cfg, tc, data, cate_list, idx, params = _setup(model_name)
    tc = dataclasses.replace(tc, optimizer="adam", learning_rate=0.01)

    dense = _dense_chunk(model, cfg, tc, cate_list, data)
    p_dense, st_dense, losses_dense = dense(
        jax.tree_util.tree_map(jnp.copy, params), idx)
    adam_dense = sparse.find_adam_state(st_dense)

    chunk = sparse.make_sparse_adam_chunk(
        model, cfg, tc, cate_list, data, params, False, lr_schedule(tc))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    p_sparse, mu, nu, _, loss_sparse = chunk(
        jax.tree_util.tree_map(jnp.copy, params),
        jax.tree_util.tree_map(jnp.copy, zeros),
        jax.tree_util.tree_map(jnp.copy, zeros),
        jnp.asarray(0, jnp.int32), idx, jax.random.PRNGKey(0), data)

    # atol 2e-3: FFN output biases see catastrophically-cancelled grads
    # (~1e-10, 100% relative f32 noise and « Adam's eps) whose update is
    # sign-like — reassociation noise between any two compiled programs
    # walks chaotically there (verified leaf-identical at 1 step).  Live
    # leaves are ~0.3-scale, so rtol=2e-3 still binds for real bugs.
    _assert_tree_close(p_sparse, p_dense, rtol=2e-3, atol=2e-3,
                       tag=f"{model_name} params")
    _assert_tree_close(mu, adam_dense.mu, rtol=2e-3, atol=2e-6,
                       tag=f"{model_name} mu")
    _assert_tree_close(nu, adam_dense.nu, rtol=2e-3, atol=2e-8,
                       tag=f"{model_name} nu")
    np.testing.assert_allclose(float(loss_sparse),
                               float(jnp.mean(losses_dense)), rtol=1e-3)


def test_sparse_clip_active():
    """The global-norm clip must fire identically on both paths (TLSAN at
    lr=1.0 exceeds max_norm=5 early)."""
    model, cfg, tc, data, cate_list, idx, params = _setup("tlsan", steps=5)
    tc = dataclasses.replace(tc, max_gradient_norm=0.05)  # always clipping
    dense = _dense_chunk(model, cfg, tc, cate_list, data)
    p_dense, _, _ = dense(jax.tree_util.tree_map(jnp.copy, params), idx)
    chunk = sparse.make_sparse_chunk(
        model, cfg, tc, cate_list, data, params, False, lr_schedule(tc))
    p_sparse, _, _ = chunk(jax.tree_util.tree_map(jnp.copy, params),
                           jnp.asarray(0, jnp.int32), idx,
                           jax.random.PRNGKey(0), data)
    _assert_tree_close(p_sparse, p_dense, rtol=2e-4, atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("optimizer", ["sgd", "adam"])
@pytest.mark.parametrize("model_name", ["tlsan", "atrank", "lspm"])
def test_sparse_mesh_matches_single_device(tmp_path, model_name, optimizer):
    """Sparse touched-row updates composed with a (dp=4, mp=2) mesh — the
    batch dp-sharded, vocab tables row-sharded with the masked-gather/psum
    exchange, touched-row scatters shard_mapped per mp shard — must match
    the SINGLE-DEVICE DENSE Trainer after a train chunk.  Families cover
    full-table L2 (tlsan), row-L2 (atrank) and the LSPM short_w/long_w
    auxiliary vocab tables."""
    from tlsan_tpu.train.loop import Trainer

    cfg0 = ModelConfig(model=model_name)
    train_b, test_b, cate_list, cfg = prepare(model_name, DATA, cfg0)
    train_b = Batches({k: v[:192] for k, v in train_b.arrays.items()},
                      min(192, train_b.n))
    test_b = Batches({k: v[:96] for k, v in test_b.arrays.items()},
                     min(96, test_b.n))
    model = get_model(model_name)
    lr = 1.0 if optimizer == "sgd" else 0.01
    base = dict(max_epochs=1, train_batch_size=32, test_batch_size=32,
                steps_per_call=3, eval_freq=10**9, best_after_step=0,
                optimizer=optimizer, learning_rate=lr)

    tr1 = Trainer(model, cfg, TrainConfig(model_dir=str(tmp_path / "single"),
                                          sparse_updates=False, **base),
                  cate_list, train_b, test_b, use_pallas=False)
    idx = tr1._epoch_index(0)[0]
    tr1.params, tr1.opt_state, loss1 = tr1._train_chunk(
        tr1.params, tr1.opt_state, idx)

    tr2 = Trainer(model, cfg, TrainConfig(model_dir=str(tmp_path / "mesh"),
                                          dp=4, mp=2, sparse_updates=True,
                                          **base),
                  cate_list, train_b, test_b, use_pallas=False)
    assert tr2._use_sparse, "sparse path must engage under the mesh"
    tr2.params, tr2.opt_state, loss2 = tr2._train_chunk(
        tr2.params, tr2.opt_state, idx)

    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-3)
    # canonical (unpadded) params must match the dense single-device run.
    # adam atol 2e-3: same near-zero-grad bias chaos as
    # test_sparse_adam_matches_dense (see comment there)
    _assert_tree_close(tr2._ckpt_params(), tr1._ckpt_params(),
                       rtol=2e-3, atol=2e-5 if optimizer == "sgd" else 2e-3,
                       tag=f"{model_name}/{optimizer} mesh-sparse")


def test_sparse_matches_dense_large_batch_inscan():
    """B > 128 takes the NON-hoisted sparse chunk (in-scan per-step batch
    gathers — the measured large-batch gate shared with the dense path,
    train/sparse.py); parity must hold on that code path too, for both the
    SGD and the Adam chunk."""
    model, cfg, tc, data, cate_list, idx, params = _setup(
        "tlsan", B=192, steps=3)
    assert tc.train_batch_size > 128  # non-hoist gate engaged

    dense = _dense_chunk(model, cfg, tc, cate_list, data)
    p_dense, _, losses_dense = dense(
        jax.tree_util.tree_map(jnp.copy, params), idx)
    chunk = sparse.make_sparse_chunk(
        model, cfg, tc, cate_list, data, params, False, lr_schedule(tc))
    p_sparse, _, loss_sparse = chunk(
        jax.tree_util.tree_map(jnp.copy, params),
        jnp.asarray(0, jnp.int32), idx, jax.random.PRNGKey(0), data)
    _assert_tree_close(p_sparse, p_dense, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(float(loss_sparse),
                               float(jnp.mean(losses_dense)), rtol=1e-3)

    tc_a = dataclasses.replace(tc, optimizer="adam", learning_rate=0.01)
    dense_a = _dense_chunk(model, cfg, tc_a, cate_list, data)
    p_dense_a, _, _ = dense_a(jax.tree_util.tree_map(jnp.copy, params), idx)
    chunk_a = sparse.make_sparse_adam_chunk(
        model, cfg, tc_a, cate_list, data, params, False, lr_schedule(tc_a))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    p_sparse_a, _, _, _, _ = chunk_a(
        jax.tree_util.tree_map(jnp.copy, params),
        jax.tree_util.tree_map(jnp.copy, zeros),
        jax.tree_util.tree_map(jnp.copy, zeros),
        jnp.asarray(0, jnp.int32), idx, jax.random.PRNGKey(0), data)
    _assert_tree_close(p_sparse_a, p_dense_a, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("model_name", ["tlsan", "atrank"])
def test_sparse_bf16_matches_dense_bf16(model_name):
    """sparse × bf16 (VERDICT r3 #4's last leg): the touched-row SGD chunk
    under compute_dtype=bfloat16 equals the dense optax step under the same
    mixed-precision gate.  Both paths cast params+batch to bf16 only inside
    loss_fn (f32 master weights, f32 grads via the cast's VJP); the sparse
    chunk's analytic L2-decay/clip-norm recurrence runs on the f32 masters,
    so agreement here proves the recurrence is untouched by the bf16 network
    compute.  Tolerances are wider than the f32 tests: the two programs fuse
    differently, and bf16 rounding (~3 significant digits) amplifies
    reassociation differences over the 30-step scan."""
    model, cfg, tc, data, cate_list, idx, params = _setup(model_name)
    tc = dataclasses.replace(tc, compute_dtype="bfloat16")

    dense = _dense_chunk(model, cfg, tc, cate_list, data)
    p_dense, _, losses_dense = dense(
        jax.tree_util.tree_map(jnp.copy, params), idx)

    chunk = sparse.make_sparse_chunk(
        model, cfg, tc, cate_list, data, params, False, lr_schedule(tc))
    p_sparse, _, loss_sparse = chunk(
        jax.tree_util.tree_map(jnp.copy, params),
        jnp.asarray(0, jnp.int32), idx, jax.random.PRNGKey(0), data)

    # masters stay f32 on both paths
    for leaf in jax.tree_util.tree_leaves(p_sparse):
        assert leaf.dtype == jnp.float32
    _assert_tree_close(p_sparse, p_dense, rtol=2e-2, atol=2e-3,
                       tag=f"{model_name} bf16")
    np.testing.assert_allclose(float(loss_sparse),
                               float(jnp.mean(losses_dense)), rtol=1e-2)


def test_sparse_adam_bf16_matches_dense_bf16():
    """The scatter-moment Adam chunk composes with bf16 the same way."""
    model, cfg, tc, data, cate_list, idx, params = _setup("tlsan", steps=15)
    tc = dataclasses.replace(tc, optimizer="adam", learning_rate=0.01,
                             compute_dtype="bfloat16")

    dense = _dense_chunk(model, cfg, tc, cate_list, data)
    p_dense, st_dense, _ = dense(
        jax.tree_util.tree_map(jnp.copy, params), idx)
    adam_dense = sparse.find_adam_state(st_dense)

    chunk = sparse.make_sparse_adam_chunk(
        model, cfg, tc, cate_list, data, params, False, lr_schedule(tc))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    p_sparse, mu, nu, _, _ = chunk(
        jax.tree_util.tree_map(jnp.copy, params),
        jax.tree_util.tree_map(jnp.copy, zeros),
        jax.tree_util.tree_map(jnp.copy, zeros),
        jnp.asarray(0, jnp.int32), idx, jax.random.PRNGKey(0), data)

    for leaf in jax.tree_util.tree_leaves((p_sparse, mu, nu)):
        assert leaf.dtype == jnp.float32
    # Under bf16, Adam's sqrt(nu) normalization makes updates on
    # cancellation-dominated leaves (FFN biases with ~1e-10 grads) sign-like
    # in the grads' bf16 rounding noise, so those params random-walk apart
    # between ANY two compiled programs (measured maxabs 3.2e-2 after 15
    # steps; /tmp repro in the round-4 notes).  The moments, by contrast,
    # are LINEAR in the grads — their agreement proves the gradient flow and
    # the analytic untouched-row recurrence are identical to bf16 rounding:
    # measured mu maxabs ≤ 4e-5, nu ≤ 1e-8 across every leaf.  Assert the
    # moments tightly (5× envelope) and cap params at the walk envelope.
    _assert_tree_close(mu, adam_dense.mu, rtol=5e-2, atol=2e-4,
                       tag="tlsan adam bf16 mu")
    _assert_tree_close(nu, adam_dense.nu, rtol=5e-2, atol=1e-7,
                       tag="tlsan adam bf16 nu")
    flat_g = dict(jax.tree_util.tree_leaves_with_path(p_sparse))
    for path, w in jax.tree_util.tree_leaves_with_path(p_dense):
        err = np.abs(np.asarray(flat_g[path]) - np.asarray(w))
        assert err.max() < 1e-1, (jax.tree_util.keystr(path), err.max())


def test_sparse_auto_gate_adam_batch():
    """The AUTO gate's Adam exception (round-4 2M-row A/B,
    runs/r4/synth2m_adam_*): exact optax-Adam semantics force dense
    per-step moment passes, so auto-sparse only pays off for adam in the
    small-batch latency regime — adam at batch > 128 stays dense, adam at
    b32 and SGD at any batch engage sparse above the row threshold.
    Forced --sparse always wins over the auto gate."""
    from tests.test_train import synthetic
    from tlsan_tpu.models.tlsan import TLSAN
    from tlsan_tpu.train.loop import Trainer

    train, test, cate_list = synthetic()
    cfg = ModelConfig(model="tlsan", user_count=20, item_count=30,
                      cate_count=5, Ls=10, Ts=8)

    def use_sparse(optimizer, batch, forced=None, rows_gate=1):
        tc = TrainConfig(model_dir="/tmp/gate", optimizer=optimizer,
                         learning_rate=0.01, train_batch_size=batch,
                         test_batch_size=64, sparse_updates=forced,
                         sparse_auto_rows=rows_gate, steps_per_call=2,
                         max_epochs=1, eval_freq=10**9)
        tr = Trainer(TLSAN, cfg, tc, cate_list, train, test,
                     use_pallas=False)
        return tr._use_sparse

    assert use_sparse("sgd", 32)
    assert use_sparse("sgd", 512)
    assert use_sparse("adam", 32)
    assert not use_sparse("adam", 512)          # the measured exception
    assert use_sparse("adam", 512, forced=True)  # forcing still works
    assert not use_sparse("sgd", 32, rows_gate=10**9)  # below threshold
