"""Serving: Recommender top-k correctness, padding, history exclusion,
checkpoint round-trip."""

import jax
import numpy as np
import pytest

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.models.tlsan import TLSAN
from tlsan_tpu.serve.recommender import Recommender
from tlsan_tpu.train import checkpoint
from tlsan_tpu.train.state import make_optimizer


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(model="tlsan", user_count=32, item_count=48,
                      cate_count=6, Ls=10, Ts=8, catalog_items=40)
    params = TLSAN.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 16
    batch = {
        "u": rng.integers(0, 32, B).astype(np.int32),
        "c": rng.integers(0, 6, B).astype(np.int32),
        "hist_i": rng.integers(0, 40, (B, 10)).astype(np.int32),
        "hist_t": rng.uniform(0.1, 1, (B, 10)).astype(np.float32),
        "hist_i_new": rng.integers(0, 40, (B, 8)).astype(np.int32),
        "sl": rng.integers(1, 11, B).astype(np.int32),
        "sl_new": rng.integers(1, 9, B).astype(np.int32),
    }
    cate_list = rng.integers(0, 6, 48).astype(np.int32)
    return cfg, params, batch, cate_list


def test_topk_matches_dense_argsort(setup):
    cfg, params, batch, cate_list = setup
    rec = Recommender(TLSAN, params, cate_list, cfg, k=5, use_pallas=False,
                      batch_size=16)
    ids, scores = rec.recommend(batch)
    assert ids.shape == (16, 5) and scores.shape == (16, 5)
    import jax.numpy as jnp
    logits = np.array(TLSAN.eval_logits(
        params, {k: jnp.asarray(v) for k, v in batch.items()},
        jnp.asarray(cate_list), cfg, False))
    logits[:, cfg.catalog_items:] = -np.inf
    expect = np.argsort(-logits, axis=1)[:, :5]
    np.testing.assert_array_equal(ids, expect)
    # padding rows never appear
    assert ids.max() < cfg.catalog_items


def test_padding_roundtrip(setup):
    cfg, params, batch, cate_list = setup
    rec = Recommender(TLSAN, params, cate_list, cfg, k=5, use_pallas=False,
                      batch_size=16)
    # request 7 users through a 16-wide compiled batch
    small = {k: v[:7] for k, v in batch.items()}
    ids_small, _ = rec.recommend(small)
    ids_full, _ = rec.recommend(batch)
    np.testing.assert_array_equal(ids_small, ids_full[:7])


def test_exclude_history(setup):
    cfg, params, batch, cate_list = setup
    rec = Recommender(TLSAN, params, cate_list, cfg, k=40, use_pallas=False,
                      exclude_history=True, batch_size=16)
    ids, scores = rec.recommend(batch)
    for r in range(16):
        hist = set(batch["hist_i"][r, :batch["sl"][r]].tolist())
        hist |= set(batch["hist_i_new"][r, :batch["sl_new"][r]].tolist())
        ranked = [i for i, s in zip(ids[r], scores[r]) if np.isfinite(s)]
        assert not hist.intersection(ranked)


def test_from_model_dir_roundtrip(setup, tmp_path):
    cfg, params, batch, cate_list = setup
    tc = TrainConfig()
    opt_state = make_optimizer(tc).init(params)
    checkpoint.save(str(tmp_path), "tlsan", 123, params, opt_state, cfg, tc)
    rec = Recommender.from_model_dir(str(tmp_path), cate_list, k=5,
                                     use_pallas=False, batch_size=16)
    direct = Recommender(TLSAN, params, cate_list, cfg, k=5,
                         use_pallas=False, batch_size=16)
    ids_a, sc_a = rec.recommend(batch)
    ids_b, sc_b = direct.recommend(batch)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(sc_a, sc_b, rtol=1e-6)


def test_meshed_matches_single_chip(setup):
    from tlsan_tpu.parallel.mesh import make_mesh

    cfg, params, batch, cate_list = setup
    mesh = make_mesh(dp=2, mp=2)
    single = Recommender(TLSAN, params, cate_list, cfg, k=5,
                         use_pallas=False, batch_size=16)
    meshed = Recommender(TLSAN, params, cate_list, cfg, k=5,
                         use_pallas=False, batch_size=16, mesh=mesh)
    ids_a, sc_a = single.recommend(batch)
    ids_b, sc_b = meshed.recommend(batch)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(sc_a, sc_b, rtol=1e-5, atol=1e-5)


def test_meshed_exclude_history(setup):
    from tlsan_tpu.parallel.mesh import make_mesh

    cfg, params, batch, cate_list = setup
    mesh = make_mesh(dp=2, mp=2)
    meshed = Recommender(TLSAN, params, cate_list, cfg, k=10,
                         use_pallas=False, batch_size=16, mesh=mesh,
                         exclude_history=True)
    ids, scores = meshed.recommend(batch)
    for r in range(16):
        hist = set(batch["hist_i"][r, :batch["sl"][r]].tolist())
        hist |= set(batch["hist_i_new"][r, :batch["sl_new"][r]].tolist())
        ranked = [i for i, s in zip(ids[r], scores[r]) if np.isfinite(s)]
        assert not hist.intersection(ranked)
        assert len(ranked) > 0


def test_exclude_history_right_aligned_lspm():
    from tlsan_tpu.models.lspm import LSPM

    cfg = ModelConfig(model="lspm", user_count=16, item_count=32,
                      cate_count=4, catalog_items=32)
    params = LSPM.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, k = 8, cfg.lspm_k
    sl = rng.integers(1, k + 1, B).astype(np.int32)
    hist = np.zeros((B, k), np.int32)
    for r in range(B):  # right-aligned: real items in the LAST sl columns
        hist[r, k - sl[r]:] = rng.integers(1, 32, sl[r])
    batch = {"u": rng.integers(0, 16, B).astype(np.int32),
             "hist_i": hist, "sl": sl}
    rec = Recommender(LSPM, params, np.zeros(32, np.int32), cfg, k=30,
                      use_pallas=False, exclude_history=True, batch_size=8)
    ids, scores = rec.recommend(batch)
    for r in range(B):
        real = set(hist[r, k - sl[r]:].tolist())
        ranked = [i for i, s in zip(ids[r], scores[r]) if np.isfinite(s)]
        assert not real.intersection(ranked)
        # pad id 0 must NOT be excluded (it's a real catalog item)
        if sl[r] < k:
            assert 0 in ranked
