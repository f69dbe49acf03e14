"""End-to-end Trainer on a (dp, mp) mesh equals the single-device Trainer,
including vocab-size padding + catalog masking (item counts not divisible
by mp) — for EVERY model family, including each family's distributed
top-k eval (parallel/topk.py k·mp exchange instead of the table
all-gather)."""

import numpy as np
import jax
import pytest

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.data.batcher import Batches
from tlsan_tpu.models import get_model
from tlsan_tpu.models.tlsan import TLSAN
from tlsan_tpu.train.cli import prepare
from tlsan_tpu.train.loop import Trainer
from tests.test_train import synthetic

DATA = "/root/reference/Data/Clothing_Shoes_and_Jewelry.pkl"

ALL_FAMILIES = ["tlsan", "atrank", "shan", "csan", "lspm",
                "paca", "cnn", "bilstm", "bpr"]


def _slice(b: Batches, n: int) -> Batches:
    n = min(n, b.n)
    return Batches({k: v[:n] for k, v in b.arrays.items()}, n)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("model_name", ALL_FAMILIES)
def test_mesh_matches_single_device_all_families(tmp_path, model_name):
    """One train chunk + full eval (AUC and the top-k metrics, which route
    through the sharded k·mp candidate exchange under mp>1) must match the
    single-device Trainer on real Clothing data for every family."""
    cfg0 = ModelConfig(model=model_name)
    train_b, test_b, cate_list, cfg = prepare(model_name, DATA, cfg0)
    train_b, test_b = _slice(train_b, 192), _slice(test_b, 96)
    model = get_model(model_name)
    base = dict(max_epochs=1, train_batch_size=32, test_batch_size=32,
                steps_per_call=3, eval_freq=10**9, best_after_step=0,
                sparse_updates=False)

    tc1 = TrainConfig(model_dir=str(tmp_path / "single"), **base)
    tr1 = Trainer(model, cfg, tc1, cate_list, train_b, test_b,
                  use_pallas=False)
    m1 = tr1.evaluate()
    _, _, loss1 = tr1._train_chunk(
        tr1.params, tr1.opt_state, tr1._epoch_index(0)[0])

    tc2 = TrainConfig(model_dir=str(tmp_path / "mesh"), dp=4, mp=2, **base)
    tr2 = Trainer(model, cfg, tc2, cate_list, train_b, test_b,
                  use_pallas=False)
    m2 = tr2.evaluate()
    _, _, loss2 = tr2._train_chunk(
        tr2.params, tr2.opt_state, tr2._epoch_index(0)[0])

    for k in m1:
        assert abs(m1[k] - m2[k]) < 1e-5, (k, m1[k], m2[k])
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_trainer_matches_single_device(tmp_path):
    # items=30, users=20, cates=5 — none divisible by mp=2 cleanly except 30
    train, test, cate_list = synthetic(n=256, users=21, items=29, cates=5)
    cfg = ModelConfig(model="tlsan", user_count=21, item_count=29,
                      cate_count=5, Ls=10, Ts=8)
    base = dict(max_epochs=1, train_batch_size=32, test_batch_size=64,
                steps_per_call=4, eval_freq=8, best_after_step=0,
                learning_rate=0.5)

    tc1 = TrainConfig(model_dir=str(tmp_path / "single"), **base)
    tr1 = Trainer(TLSAN, cfg, tc1, cate_list, train, test, use_pallas=False)
    m1 = tr1.evaluate()
    tr1.params, tr1.opt_state, loss1 = tr1._train_chunk(
        tr1.params, tr1.opt_state, tr1._epoch_index(0)[0])

    tc2 = TrainConfig(model_dir=str(tmp_path / "mesh"), dp=4, mp=2, **base)
    tr2 = Trainer(TLSAN, cfg, tc2, cate_list, train, test, use_pallas=False)
    m2 = tr2.evaluate()
    tr2.params, tr2.opt_state, loss2 = tr2._train_chunk(
        tr2.params, tr2.opt_state, tr2._epoch_index(0)[0])

    # padded vocab rows must not change any metric or the training loss
    assert abs(m1["auc"] - m2["auc"]) < 1e-6
    for k in m1:
        assert abs(m1[k] - m2[k]) < 1e-5, k
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_trainer_padded_tables_shapes(tmp_path):
    train, test, cate_list = synthetic(n=64, users=21, items=29, cates=5)
    cfg = ModelConfig(model="tlsan", user_count=21, item_count=29,
                      cate_count=5, Ls=10, Ts=8)
    tc = TrainConfig(model_dir=str(tmp_path / "m"), dp=2, mp=4,
                     train_batch_size=32, test_batch_size=64,
                     steps_per_call=2, max_epochs=1)
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    assert tr.cfg.item_count % 4 == 0
    assert tr.cfg.user_count % 4 == 0
    assert tr.cfg.catalog_items == 29
    assert tr.params["item_emb"].shape[0] == tr.cfg.item_count
    # padded rows are zero
    assert float(np.abs(np.asarray(tr.params["item_emb"])[29:]).sum()) == 0.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cross_topology_checkpoint_roundtrip(tmp_path):
    """mp=1 → mp=2 → mp=1 restore chain: checkpoints are written in
    canonical unpadded form, so params and the resumed step survive
    topology changes bit-exactly."""
    train, test, cate_list = synthetic(n=128, users=21, items=29, cates=5)
    cfg = ModelConfig(model="tlsan", user_count=21, item_count=29,
                      cate_count=5, Ls=10, Ts=8)
    base = dict(max_epochs=1, train_batch_size=32, test_batch_size=64,
                steps_per_call=2, eval_freq=10**9, best_after_step=0,
                sparse_updates=False)
    d = str(tmp_path / "run")

    tr1 = Trainer(TLSAN, cfg, TrainConfig(model_dir=d, **base),
                  cate_list, train, test, use_pallas=False)
    tr1.train()
    p1 = jax.tree_util.tree_map(np.asarray, tr1._ckpt_params())
    step1 = tr1.step

    tr2 = Trainer(TLSAN, cfg,
                  TrainConfig(model_dir=d, from_scratch=False, dp=4, mp=2,
                              **base),
                  cate_list, train, test, use_pallas=False)
    assert tr2.step == step1
    p2 = jax.tree_util.tree_map(np.asarray, tr2._ckpt_params())
    jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p2)
    # padded rows exist on the mesh run and are zero
    assert tr2.params["item_emb"].shape[0] == 30
    tr2.train()

    tr3 = Trainer(TLSAN, cfg,
                  TrainConfig(model_dir=d, from_scratch=False, **base),
                  cate_list, train, test, use_pallas=False)
    assert tr3.step == tr2.step
    p2b = jax.tree_util.tree_map(np.asarray, tr2._ckpt_params())
    p3 = jax.tree_util.tree_map(np.asarray, tr3._ckpt_params())
    jax.tree_util.tree_map(np.testing.assert_array_equal, p2b, p3)
