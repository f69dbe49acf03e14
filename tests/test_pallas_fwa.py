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


@pytest.mark.parametrize("B", [6, 37])
def test_kernel_vjp_matches_reference(B):
    # B=6 fits one TB=8 batch tile; B=37 forces cdiv(B,TB)>1 so the
    # backward's cross-tile weight-grad accumulation (pl.when init on tile 0
    # + += over the sequential grid) and the multi-tile dx path are covered
    x, lengths, ws = _mk(B, 10, 64, 8)
    g1 = jax.grad(lambda x, w: F.fwa_pallas(x, lengths, 8, w, *ws[1:]).sum(),
                  argnums=(0, 1))(x, ws[0])
    g2 = jax.grad(lambda x, w: ref(x, lengths, 8, w, *ws[1:]).sum(),
                  argnums=(0, 1))(x, ws[0])
    # the hand-written backward kernel sums in a different (but valid)
    # order than the jnp reference - tiny atol absorbs f32 associativity
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-5, atol=1e-6)


def test_block_diag():
    w = jnp.arange(4, dtype=jnp.float32).reshape(2, 2)
    bd = F._block_diag(w, 2)
    want = np.zeros((4, 4), np.float32)
    want[:2, :2] = np.asarray(w)
    want[2:, 2:] = np.asarray(w)
    np.testing.assert_array_equal(np.asarray(bd), want)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fwa_shard_mapped_matches_single_device():
    """The kernel composed with shard_map over dp (ops/pallas/sharded.py)
    must equal the single-device pallas_call, forward and backward —
    this is the mesh+Pallas composition the trainer uses under dp/mp."""
    from tlsan_tpu.ops.pallas.sharded import shard_map_batch_op
    from tlsan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=4, mp=2, devices=jax.devices())
    B, S, D, H = 32, 10, 64, 8
    x, lengths, ws = _mk(B, S, D, H)

    single = F.fwa_pallas(x, lengths, H, *ws)
    fn = lambda x, l, *w: F.fwa_pallas(x, l, H, *w)
    sharded = shard_map_batch_op(mesh, fn, x, lengths, *ws)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-6, rtol=1e-6)

    g1 = jax.grad(lambda x: F.fwa_pallas(x, lengths, H, *ws).sum())(x)
    g2 = jax.grad(
        lambda x: shard_map_batch_op(mesh, fn, x, lengths, *ws).sum())(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_trainer_with_pallas_matches_xla(tmp_path, monkeypatch):
    """A (dp, mp) TLSAN Trainer chunk with use_pallas=True (kernels
    shard_mapped over dp, interpret mode) equals the XLA mesh path — the
    round-1 'Pallas XOR mesh' restriction is gone."""
    import tlsan_tpu.ops.pallas.mha as M
    monkeypatch.setattr(
        M.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))

    from tests.test_train import synthetic
    from tlsan_tpu.core.config import ModelConfig, TrainConfig
    from tlsan_tpu.models.tlsan import TLSAN
    from tlsan_tpu.train.loop import Trainer

    train, test, cate_list = synthetic(n=128, users=21, items=29, cates=5)
    cfg = ModelConfig(model="tlsan", user_count=21, item_count=29,
                      cate_count=5, Ls=10, Ts=8)
    base = dict(max_epochs=1, train_batch_size=32, test_batch_size=64,
                steps_per_call=2, eval_freq=10**9, best_after_step=0,
                dp=4, mp=2, sparse_updates=False)

    tr_x = Trainer(TLSAN, cfg, TrainConfig(model_dir=str(tmp_path / "x"),
                                           **base),
                   cate_list, train, test, use_pallas=False)
    _, _, loss_x = tr_x._train_chunk(tr_x.params, tr_x.opt_state,
                                     tr_x._epoch_index(0)[0])

    tr_p = Trainer(TLSAN, cfg, TrainConfig(model_dir=str(tmp_path / "p"),
                                           **base),
                   cate_list, train, test, use_pallas=True)
    m_p = tr_p.evaluate()
    _, _, loss_p = tr_p._train_chunk(tr_p.params, tr_p.opt_state,
                                     tr_p._epoch_index(0)[0])

    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-5)
    assert 0.0 <= m_p["auc"] <= 1.0
