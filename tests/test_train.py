"""Trainer integration tests on a tiny synthetic dataset: loss decreases,
checkpoint round-trips bit-exactly, metrics are written."""

import os

import numpy as np
import jax
import pytest

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.data.batcher import Batches
from tlsan_tpu.models.tlsan import TLSAN
from tlsan_tpu.train.loop import Trainer
from tlsan_tpu.train import checkpoint as ckpt
from tlsan_tpu.train.state import make_optimizer


def synthetic(n=256, users=20, items=30, cates=5, Ls=10, Ts=8, seed=0):
    rng = np.random.default_rng(seed)
    # planted structure: even users like even items
    u = rng.integers(0, users, n).astype(np.int32)
    y = rng.integers(0, 2, n).astype(np.float32)
    i = (2 * rng.integers(0, items // 2, n) + ((u % 2) != (y > 0.5))).astype(np.int32)
    arrays = dict(
        u=u, i=i % items, y=y,
        c=rng.integers(0, cates, n).astype(np.int32),
        hist_i=rng.integers(0, items, (n, Ls)).astype(np.int32),
        hist_t=rng.uniform(0.1, 1, (n, Ls)).astype(np.float32),
        hist_i_new=rng.integers(0, items, (n, Ts)).astype(np.int32),
        sl=rng.integers(1, Ls + 1, n).astype(np.int32),
        sl_new=rng.integers(1, Ts + 1, n).astype(np.int32),
    )
    train = Batches(arrays, n)
    test_arrays = dict(arrays)
    test_arrays["j"] = rng.integers(0, items, n).astype(np.int32)
    del test_arrays["y"]
    test = Batches(test_arrays, n)
    cate_list = rng.integers(0, cates, items).astype(np.int32)
    return train, test, cate_list


@pytest.fixture()
def tiny(tmp_path):
    train, test, cate_list = synthetic()
    cfg = ModelConfig(model="tlsan", user_count=20, item_count=30,
                      cate_count=5, Ls=10, Ts=8)
    tc = TrainConfig(model_dir=str(tmp_path / "run"), max_epochs=2,
                     train_batch_size=32, test_batch_size=64,
                     steps_per_call=4, eval_freq=8, best_after_step=0,
                     learning_rate=0.5)
    return train, test, cate_list, cfg, tc


def test_loss_decreases(tiny):
    train, test, cate_list, cfg, tc = tiny
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    losses = []
    for chunk_idx in tr._epoch_index(0):
        tr.params, tr.opt_state, loss = tr._train_chunk(
            tr.params, tr.opt_state, chunk_idx)
        losses.append(float(loss))
    for _ in range(4):
        for chunk_idx in tr._epoch_index(1):
            tr.params, tr.opt_state, loss = tr._train_chunk(
                tr.params, tr.opt_state, chunk_idx)
            losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_large_batch_chunk_matches_hoisted(tmp_path):
    """The dense chunk has two batch-assembly variants (hoisted [K,B,...]
    xs for B<=128, in-scan gathers above — measured split, train/loop.py).
    Driving the SAME [K, B=160] index stream through both must give the
    same losses.  (The tc.train_batch_size only picks the variant at
    build time; the fed idx shape is what matters.)"""
    import dataclasses

    train, test, cate_list = synthetic(n=512)
    cfg = ModelConfig(model="tlsan", user_count=20, item_count=30,
                      cate_count=5, Ls=10, Ts=8)
    tc = TrainConfig(model_dir=str(tmp_path / "big"), max_epochs=1,
                     train_batch_size=160, test_batch_size=64,
                     steps_per_call=2, eval_freq=10**9, best_after_step=0)
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    idx = tr._epoch_index(0)[0]  # [2, 160]
    _, _, loss_inscan = tr._train_chunk(
        jax.tree_util.tree_map(lambda x: x.copy(), tr.params),
        jax.tree_util.tree_map(lambda x: x.copy(), tr.opt_state), idx)

    # rebuild the chunk with a small-batch tc so the hoisted branch is
    # compiled, then feed it the identical B=160 stream
    tr.tc = dataclasses.replace(tc, train_batch_size=32)
    hoisted_chunk = tr._build_train_chunk()
    tr.tc = tc
    _, _, loss_hoist = hoisted_chunk(tr.params, tr.opt_state, idx)

    np.testing.assert_allclose(float(loss_hoist), float(loss_inscan),
                               rtol=1e-6)


def test_full_train_writes_artifacts(tiny):
    train, test, cate_list, cfg, tc = tiny
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    best = tr.train()
    assert "auc" in best and 0.0 <= best["auc"] <= 1.0
    assert os.path.exists(os.path.join(tc.model_dir, "metrics.jsonl"))
    assert ckpt.latest_checkpoint(tc.model_dir) is not None


def test_checkpoint_roundtrip(tiny, tmp_path):
    train, test, cate_list, cfg, tc = tiny
    params = TLSAN.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(tc)
    opt_state = opt.init(params)
    path = ckpt.save(str(tmp_path / "ck"), "tlsan", 123, params, opt_state, cfg)
    step, p2, o2 = ckpt.restore(path, params, opt_state)
    assert step == 123
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_step(tiny):
    train, test, cate_list, cfg, tc = tiny
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    tr.train()
    saved_step = tr.step
    tc2 = TrainConfig(**{**tc.__dict__, "from_scratch": False})
    tr2 = Trainer(TLSAN, cfg, tc2, cate_list, train, test, use_pallas=False)
    assert tr2.step == saved_step


def test_trainer_writes_histogram_summaries(tiny):
    """A real train run must emit the reference's train_summary set
    (TLSAN/model.py:173-183) as TensorBoard-loadable histograms + the
    L2_norm_user_item scalar."""
    train, test, cate_list, cfg, tc = tiny
    import dataclasses
    tc = dataclasses.replace(tc, display_freq=4, summary_freq=4)
    trainer = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    trainer.train()
    trainer.writer.close()

    from tensorboard.backend.event_processing import event_accumulator
    acc = event_accumulator.EventAccumulator(
        os.path.join(tc.model_dir, "train"),
        size_guidance={event_accumulator.HISTOGRAMS: 0})
    acc.Reload()
    tags = acc.Tags()
    expect = {"gamma", "embedding/1_item_emb", "embedding/2_user_emb",
              "embedding/3_cate_emb", "embedding/4_usert_emb",
              "attention_output"}
    assert expect <= set(tags["histograms"]), tags["histograms"]
    assert "L2_norm_user_item" in set(tags["scalars"])
    h = acc.Histograms("embedding/1_item_emb")[0].histogram_value
    assert h.num == 30 * 32  # full table
