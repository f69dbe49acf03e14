"""bf16 mixed-precision training mode (TrainConfig.compute_dtype).

Contract: master params, optimizer state, loss reductions and the L2 term
stay f32; only the network forward/backward compute runs in bfloat16
(train/loop.py _bf16_cast).  The reference is pure f32 (TF 1.8), so bf16 is
opt-in; these tests pin the mode's semantics on the CPU mesh harness.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.models import base, get_model
from tlsan_tpu.models.tlsan import TLSAN
from tlsan_tpu.train.loop import Trainer, _bf16_cast
from tests.test_all_models import ALL_MODELS, B, CATES, ITEMS, USERS, make_batch
from tests.test_train import synthetic


def _cfg(name):
    return ModelConfig(model=name, user_count=USERS, item_count=ITEMS,
                       cate_count=CATES, Ls=10, Ts=8, max_length=12,
                       cnn_pad_length=20, paca_max_len=12,
                       hidden_units=32 if name == "csan" else 64)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_bf16_loss_and_grads_close_to_f32(name):
    """Casting params+batch to bf16 inside the loss (exactly what the train
    chunk does) keeps the loss within bf16 rounding of the f32 loss and
    yields f32 gradients of comparable magnitude for every family."""
    cfg = _cfg(name)
    model = get_model(name)
    rng = np.random.default_rng(0)
    params = model.init_params(jax.random.PRNGKey(0), cfg)
    cate_list = jnp.asarray(rng.integers(0, CATES, ITEMS), jnp.int32)
    batch = make_batch(name, rng)

    def loss_f32(p):
        return model.loss(p, batch, cate_list, cfg, False)

    def loss_bf16(p):
        return model.loss(_bf16_cast(p), _bf16_cast(batch), cate_list, cfg, False)

    l32, g32 = jax.value_and_grad(loss_f32)(params)
    l16, g16 = jax.value_and_grad(loss_bf16)(params)

    assert l16.dtype == jnp.float32  # loss head stays f32
    assert np.isfinite(float(l16)), name
    # sigmoid-CE near init is O(log 2); bf16 has ~2-3 decimal digits
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05, atol=0.02)

    leaves16 = jax.tree_util.tree_leaves(g16)
    leaves32 = jax.tree_util.tree_leaves(g32)
    assert all(g.dtype == jnp.float32 for g in leaves16), name  # master grads
    gn32 = float(jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves32)))
    gn16 = float(jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves16)))
    assert np.isfinite(gn16)
    np.testing.assert_allclose(gn16, gn32, rtol=0.15, atol=1e-3)


def test_l2_tables_accumulates_in_f32():
    """A large bf16 table's sum-of-squares must not be accumulated in bf16:
    l2_tables upcasts (a no-op on f32 inputs)."""
    x = np.random.default_rng(0).normal(0.1, 0.05, (200_000,)).astype(np.float32)
    want = 0.5 * float(np.sum(np.square(x.astype(np.float64))))
    got16 = float(base.l2_tables(jnp.asarray(x, jnp.bfloat16)))
    # bf16 *values* round each element (~0.4% rel), but the f32 accumulation
    # keeps the SUM accurate; a bf16 accumulation would be off by orders
    np.testing.assert_allclose(got16, want, rtol=2e-2)
    got32 = float(base.l2_tables(jnp.asarray(x)))
    np.testing.assert_allclose(got32, want, rtol=1e-5)


def test_onehot_gather_backward_bf16_dtype():
    """The one-hot matmul gather backward must return cotangents in the
    table's dtype (custom_vjp contract) with f32 accumulation."""
    from tlsan_tpu.nn import embedding
    table = jnp.asarray(
        np.random.default_rng(1).normal(size=(32, 8)).astype(np.float32),
        jnp.bfloat16)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 32, 2048), jnp.int32)

    with embedding.gather_bwd("onehot"):
        def f(t):
            return jnp.sum(embedding.lookup(t, ids) * 2.0)
        g = jax.grad(f)(table)
    assert g.dtype == jnp.bfloat16
    # each row's grad = 2 * (times that row was gathered)
    counts = np.bincount(np.asarray(ids), minlength=32).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(g, np.float32), 2.0 * counts[:, None] @ np.ones((1, 8)),
        rtol=2e-2)


@pytest.fixture()
def tiny_bf16(tmp_path):
    train, test, cate_list = synthetic()
    cfg = ModelConfig(model="tlsan", user_count=20, item_count=30,
                      cate_count=5, Ls=10, Ts=8)
    tc = TrainConfig(model_dir=str(tmp_path / "run"), max_epochs=2,
                     train_batch_size=32, test_batch_size=64,
                     steps_per_call=4, eval_freq=8, best_after_step=0,
                     learning_rate=0.5, compute_dtype="bfloat16")
    return train, test, cate_list, cfg, tc


def test_bf16_trainer_loss_decreases(tiny_bf16):
    train, test, cate_list, cfg, tc = tiny_bf16
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    # master params stay f32
    assert all(p.dtype != jnp.bfloat16
               for p in jax.tree_util.tree_leaves(tr.params))
    losses = []
    for _ in range(5):
        for chunk_idx in tr._epoch_index(0):
            tr.params, tr.opt_state, loss = tr._train_chunk(
                tr.params, tr.opt_state, chunk_idx)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert all(p.dtype != jnp.bfloat16
               for p in jax.tree_util.tree_leaves(tr.params))


def test_bf16_trainer_tracks_f32_trajectory(tiny_bf16):
    """One chunk of bf16 training stays close to the f32 chunk: same data,
    same init, loss within bf16 noise (the trajectories diverge over many
    steps, but step one must agree)."""
    train, test, cate_list, cfg, tc = tiny_bf16
    tr16 = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    tc32 = dataclasses.replace(tc, compute_dtype="float32",
                               model_dir=tc.model_dir + "_f32")
    tr32 = Trainer(TLSAN, cfg, tc32, cate_list, train, test, use_pallas=False)
    idx = tr16._epoch_index(0)[0]
    _, _, l16 = tr16._train_chunk(tr16.params, tr16.opt_state, idx)
    _, _, l32 = tr32._train_chunk(tr32.params, tr32.opt_state, idx)
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05, atol=0.02)


def test_bf16_mesh_trainer_runs(tmp_path):
    """bf16 composes with the (dp, mp) mesh: sharded lookups and grad psums
    run on bf16 activations with f32 master state."""
    train, test, cate_list = synthetic()
    cfg = ModelConfig(model="tlsan", user_count=20, item_count=30,
                      cate_count=5, Ls=10, Ts=8)
    tc = TrainConfig(model_dir=str(tmp_path / "mesh"), max_epochs=1,
                     train_batch_size=32, test_batch_size=64,
                     steps_per_call=4, eval_freq=10**9, best_after_step=0,
                     learning_rate=0.5, dp=4, mp=2,
                     compute_dtype="bfloat16")
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    idx = tr._epoch_index(0)[0]
    _, _, loss = tr._train_chunk(tr.params, tr.opt_state, idx)
    assert np.isfinite(float(loss))


def test_bf16_sparse_trainer_runs(tmp_path):
    """Forced sparse × bf16 now composes (round 4): the touched-row chunk
    casts to bf16 only inside loss_fn, masters stay f32.  Parity vs the
    dense bf16 step lives in test_sparse.py; here the full Trainer wiring
    (chunk signature, carry, step count) must run and keep f32 masters."""
    train, test, cate_list = synthetic()
    cfg = ModelConfig(model="tlsan", user_count=20, item_count=30,
                      cate_count=5, Ls=10, Ts=8)
    tc = TrainConfig(model_dir=str(tmp_path / "sp"), sparse_updates=True,
                     max_epochs=1, train_batch_size=32, test_batch_size=64,
                     steps_per_call=4, eval_freq=10**9, best_after_step=0,
                     learning_rate=0.5, compute_dtype="bfloat16")
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    assert tr._use_sparse
    idx = tr._epoch_index(0)[0]
    params, _, loss = tr._train_chunk(tr.params, tr.opt_state, idx)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32


def test_bad_compute_dtype_rejected(tmp_path):
    train, test, cate_list = synthetic()
    cfg = ModelConfig(model="tlsan", user_count=20, item_count=30,
                      cate_count=5, Ls=10, Ts=8)
    tc = TrainConfig(model_dir=str(tmp_path / "bad"), compute_dtype="fp16")
    with pytest.raises(ValueError, match="compute_dtype"):
        Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
