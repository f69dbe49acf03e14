"""Replica fan-out (train/ensemble.py): R vmapped replicas must reproduce R
independent single-seed Trainer runs — same init draws, same per-seed
shuffle streams, same losses — while running as one program."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.models.tlsan import TLSAN
from tlsan_tpu.train.ensemble import ReplicaFanout
from tlsan_tpu.train.evaluate import make_auc_fn, _device_data
from tlsan_tpu.train.loop import Trainer
from tests.test_train import synthetic


def _cfg_tc(tmp_path, **tc_kw):
    cfg = ModelConfig(model="tlsan", user_count=20, item_count=30,
                      cate_count=5, Ls=10, Ts=8)
    kw = dict(model_dir=str(tmp_path / "run"), max_epochs=1,
              train_batch_size=32, test_batch_size=64,
              steps_per_call=4, eval_freq=8, best_after_step=0,
              learning_rate=0.5)
    kw.update(tc_kw)
    return cfg, TrainConfig(**kw)


def test_fanout_matches_sequential_trainer(tmp_path):
    train, test, cate_list = synthetic()
    cfg, tc = _cfg_tc(tmp_path)
    seeds = [1234, 42]
    fan = ReplicaFanout(TLSAN, cfg, tc, cate_list, train, test, seeds)

    fan_losses = []  # [n_chunks][R]
    for chunk_idx in fan._epoch_index(0):
        fan.params, fan.opt_state, fan._rngs, losses = fan._fan_chunk(
            fan.params, fan.opt_state, jnp.asarray(chunk_idx),
            fan._rngs, fan.lr_scales, fan.data)
        fan_losses.append(np.asarray(losses))

    for r, seed in enumerate(seeds):
        tr = Trainer(TLSAN, cfg,
                     dataclasses.replace(
                         tc, seed=seed,
                         model_dir=str(tmp_path / f"single{seed}")),
                     cate_list, train, test, use_pallas=False)
        for c, chunk_idx in enumerate(tr._epoch_index(0)):
            tr.params, tr.opt_state, loss = tr._train_chunk(
                tr.params, tr.opt_state, chunk_idx)
            np.testing.assert_allclose(
                fan_losses[c][r], float(loss), rtol=1e-3, atol=1e-4,
                err_msg=f"seed {seed} chunk {c}")
        # final params agree too (same trajectory, float-reassoc noise)
        for a, b in zip(
                jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(lambda x: x[r], fan.params)),
                jax.tree_util.tree_leaves(tr.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)


def test_fanout_lr_scale_is_exact_sgd(tmp_path):
    """A replica at lr_scale=2 must track a single Trainer at 2x the LR
    (SGD's update is linear in lr; the scale applies post-clip like the
    schedule does)."""
    train, test, cate_list = synthetic()
    cfg, tc = _cfg_tc(tmp_path)
    fan = ReplicaFanout(TLSAN, cfg, tc, cate_list, train, test,
                        seeds=[7, 7], lr_scales=[1.0, 2.0])
    for chunk_idx in fan._epoch_index(0):
        fan.params, fan.opt_state, fan._rngs, losses = fan._fan_chunk(
            fan.params, fan.opt_state, jnp.asarray(chunk_idx),
            fan._rngs, fan.lr_scales, fan.data)

    tr = Trainer(TLSAN, cfg,
                 dataclasses.replace(tc, seed=7,
                                     model_dir=str(tmp_path / "x2")),
                 cate_list, train, test, use_pallas=False)
    tr2 = Trainer(TLSAN, cfg,
                  dataclasses.replace(tc, seed=7,
                                      learning_rate=2 * tc.learning_rate,
                                      model_dir=str(tmp_path / "x2b")),
                  cate_list, train, test, use_pallas=False)
    for chunk_idx in tr._epoch_index(0):
        tr.params, tr.opt_state, _ = tr._train_chunk(
            tr.params, tr.opt_state, chunk_idx)
        tr2.params, tr2.opt_state, _ = tr2._train_chunk(
            tr2.params, tr2.opt_state, chunk_idx)
    for r, single in ((0, tr), (1, tr2)):
        for a, b in zip(
                jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(lambda x: x[r], fan.params)),
                jax.tree_util.tree_leaves(single.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)


def test_fanout_auc_matches_unvmapped(tmp_path):
    train, test, cate_list = synthetic()
    cfg, tc = _cfg_tc(tmp_path)
    fan = ReplicaFanout(TLSAN, cfg, tc, cate_list, train, test,
                        seeds=[1234, 42, 7])
    aucs = fan.auc()
    auc_one = make_auc_fn(TLSAN, cfg, jnp.asarray(cate_list), False)
    data, _ = _device_data(test, tc.test_batch_size)
    for r in range(3):
        single = float(auc_one(
            jax.tree_util.tree_map(lambda x: x[r], fan.params), data))
        np.testing.assert_allclose(aucs[r], single, atol=1e-5)


def test_fanout_train_end_to_end_bf16(tmp_path):
    """bf16 fan-out runs end-to-end and tracks the f32 fan-out's per-replica
    AUC (the synthetic task's pairwise-AUC ceiling is low ~0.53, so the
    assertion is agreement, not absolute quality)."""
    train, test, cate_list = synthetic()
    cfg, tc16 = _cfg_tc(tmp_path, compute_dtype="bfloat16", max_epochs=6)
    fan16 = ReplicaFanout(TLSAN, cfg, tc16, cate_list, train, test,
                          seeds=[1234, 42])
    out16 = fan16.train(log=lambda *_: None)
    _, tc32 = _cfg_tc(tmp_path, max_epochs=6)
    fan32 = ReplicaFanout(TLSAN, cfg, tc32, cate_list, train, test,
                          seeds=[1234, 42])
    out32 = fan32.train(log=lambda *_: None)
    assert all(np.isfinite(a) for a in out16["best_auc"])
    np.testing.assert_allclose(out16["best_auc"], out32["best_auc"],
                               atol=0.05)


def test_fanout_rejects_lr_scales_for_adam(tmp_path):
    train, test, cate_list = synthetic()
    cfg, tc = _cfg_tc(tmp_path, optimizer="adam")
    with pytest.raises(ValueError, match="SGD"):
        ReplicaFanout(TLSAN, cfg, tc, cate_list, train, test,
                      seeds=[1, 2], lr_scales=[1.0, 2.0])
