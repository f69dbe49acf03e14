"""Matmul-backward gather (nn/embedding.py gather_bwd) parity + engagement.

The default 'auto' mode keeps jnp.take for the forward (bit-exact) and
replaces only the scatter-add VJP with a one-hot matmul for small vocab
tables (the measured 2x win on the gather+scatter path at TPU b512 shapes —
runs/r3/bench_gather_v1583b.txt).  These tests pin:
  - fwd bitwise equality in every mode;
  - grad parity vs the scatter VJP within f32 reorder tolerance;
  - the engagement heuristic (small-V + big-R only; [V] biases and the
    sharded-mesh path never engage);
  - end-to-end Trainer losses match between the two backward strategies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlsan_tpu.nn import embedding as emb

V, D = 500, 16


def _table_ids_cot(rows=2048, seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, size=(rows // 32, 32)), jnp.int32)
    cot = jnp.asarray(
        rng.standard_normal((rows // 32, 32, D)), jnp.float32)
    return table, ids, cot


def test_forward_bitwise_all_modes():
    table, ids, _ = _table_ids_cot()
    ref = jnp.take(table, ids, axis=0)
    for mode in ("auto", "take", "onehot"):
        with emb.gather_bwd(mode):
            got = jax.jit(lambda t, i: emb.lookup(t, i))(table, ids)
        assert (np.asarray(got) == np.asarray(ref)).all(), mode


def test_grad_parity_take_vs_onehot():
    table, ids, cot = _table_ids_cot()

    def loss(t, mode):
        with emb.gather_bwd(mode):
            return jnp.sum(emb.lookup(t, ids) * cot)

    g_take = jax.grad(lambda t: loss(t, "take"))(table)
    g_oh = jax.grad(lambda t: loss(t, "onehot"))(table)
    scale = float(jnp.abs(g_take).max())
    assert float(jnp.abs(g_take - g_oh).max()) < 1e-5 * max(scale, 1.0)


def _grad_uses_onehot(table, ids):
    """True iff the gather backward lowers to a dot_general (matmul VJP)."""
    jaxpr = str(jax.make_jaxpr(
        jax.grad(lambda t: jnp.sum(emb.lookup(t, ids))))(table))
    return "dot_general" in jaxpr


def test_auto_engagement_heuristic(monkeypatch):
    # 'auto' only engages on accelerator backends; pretend we're on one
    monkeypatch.setattr(emb, "_accel", lambda: True)
    table, ids, _ = _table_ids_cot()
    small_ids = ids.reshape(-1)[: emb.ONEHOT_BWD_MIN_ROWS // 2]
    big_table = jnp.zeros((emb.ONEHOT_BWD_MAX_V + 1, D), jnp.float32)
    bias = jnp.zeros((V,), jnp.float32)
    with emb.gather_bwd("auto"):
        assert _grad_uses_onehot(table, ids)            # small V, big R
        assert not _grad_uses_onehot(table, small_ids)  # R below threshold
        assert not _grad_uses_onehot(big_table, ids)    # V above threshold
        # [V] biases always keep the scatter path
        jaxpr = str(jax.make_jaxpr(
            jax.grad(lambda b: jnp.sum(emb.lookup(b, ids))))(bias))
        assert "dot_general" not in jaxpr
    with emb.gather_bwd("take"):
        assert not _grad_uses_onehot(table, ids)
    with emb.gather_bwd("onehot"):
        assert _grad_uses_onehot(table, small_ids)      # forced


def test_item_cate_lookup_fused_parity():
    rng = np.random.default_rng(3)
    Vi, Vc, Di, Dc = 700, 40, 16, 16
    item = jnp.asarray(rng.standard_normal((Vi, Di)), jnp.float32)
    cate = jnp.asarray(rng.standard_normal((Vc, Dc)), jnp.float32)
    cate_list = jnp.asarray(rng.integers(0, Vc, size=Vi), jnp.int32)
    ids = jnp.asarray(rng.integers(0, Vi, size=(64, 30)), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((64, 30, Di + Dc)), jnp.float32)

    def out(mode):
        with emb.gather_bwd(mode):
            return jax.jit(lambda i_t, c_t: emb.item_cate_lookup(
                i_t, c_t, ids, cate_list))(item, cate)

    # 'take' = per-site form, 'auto' = fused build; fwd must be bitwise
    assert (np.asarray(out("take")) == np.asarray(out("auto"))).all()
    # fused engagement is observable: a [Vi, Di+Dc] fused table appears
    with emb.gather_bwd("auto"):
        jaxpr = str(jax.make_jaxpr(
            lambda i_t: emb.item_cate_lookup(i_t, cate, ids, cate_list))(item))
    assert f"f32[{Vi},{Di + Dc}]" in jaxpr

    def loss(i_t, c_t, mode):
        with emb.gather_bwd(mode):
            return jnp.sum(emb.item_cate_lookup(i_t, c_t, ids, cate_list) * cot)

    g_ref = jax.grad(lambda a, b: loss(a, b, "take"), argnums=(0, 1))(item, cate)
    g_fus = jax.grad(lambda a, b: loss(a, b, "auto"), argnums=(0, 1))(item, cate)
    for a, b in zip(g_ref, g_fus):
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < 1e-5 * scale

    # big-vocab fallback: no fused build above the threshold
    big = jnp.zeros((emb.FUSED_ITEM_CATE_MAX_V + 1, Di), jnp.float32)
    big_cl = jnp.zeros((emb.FUSED_ITEM_CATE_MAX_V + 1,), jnp.int32)
    with emb.gather_bwd("auto"):
        jaxpr = str(jax.make_jaxpr(
            lambda c_t: emb.item_cate_lookup(big, c_t, ids, big_cl))(cate))
    assert f"f32[{emb.FUSED_ITEM_CATE_MAX_V + 1},{Di + Dc}]" not in jaxpr


def test_tlsan_loss_uses_fused_table():
    """The fused [V, Di+Dc] build must actually engage in the real TLSAN
    loss trace (guards the model wiring, not just the helper)."""
    import __graft_entry__ as ge
    from tlsan_tpu.models.tlsan import TLSAN

    cfg, params, batch, cate_list = ge._tiny_setup()
    with emb.gather_bwd("auto"):
        jaxpr = str(jax.make_jaxpr(
            lambda p: TLSAN.loss(p, batch, cate_list, cfg, use_pallas=False)
        )(params))
    V = cfg.item_count
    D = cfg.itemid_embedding_size + cfg.cateid_embedding_size
    assert f"f32[{V},{D}]" in jaxpr
    with emb.gather_bwd("take"):
        jaxpr = str(jax.make_jaxpr(
            lambda p: TLSAN.loss(p, batch, cate_list, cfg, use_pallas=False)
        )(params))
    assert f"f32[{V},{D}]" not in jaxpr


def _train_losses(model_dir):
    import json
    import os
    with open(os.path.join(model_dir, "metrics.jsonl")) as f:
        return [json.loads(line)["loss"] for line in f
                if json.loads(line)["kind"] == "train"]


@pytest.mark.parametrize("model_name", ["tlsan", "atrank"])
def test_trainer_losses_match(model_name, reference_data_dir, tmp_path,
                              monkeypatch):
    from tlsan_tpu.nn import embedding as _e
    monkeypatch.setattr(_e, "_accel", lambda: True)
    import dataclasses
    from tlsan_tpu.core.config import ModelConfig, TrainConfig
    from tlsan_tpu.models import get_model
    from tlsan_tpu.train.cli import prepare
    from tlsan_tpu.train.loop import Trainer

    data = f"{reference_data_dir}/Clothing_Shoes_and_Jewelry.pkl"
    losses = {}
    for mode in ("take", "auto"):
        cfg = ModelConfig(model=model_name)
        train_b, test_b, cate_list, cfg = prepare(model_name, data, cfg, 1234)
        # tiny run: 2 chunks of 5 steps; big enough batch to engage auto
        tc = TrainConfig(model_dir=str(tmp_path / mode), max_epochs=1,
                         train_batch_size=64, test_batch_size=128,
                         steps_per_call=5, eval_freq=10**9,
                         display_freq=5, best_after_step=0,
                         tb_histograms=False, seed=7)
        train_b = dataclasses.replace(
            train_b, arrays={k: v[:640] for k, v in train_b.arrays.items()},
            n=640)
        model = get_model(model_name)
        with emb.gather_bwd(mode):
            tr = Trainer(model, cfg, tc, cate_list, train_b, test_b,
                         use_pallas=False)
            tr.train()
        losses[mode] = _train_losses(str(tmp_path / mode))
        assert losses[mode], "no display records captured"
    for a, b in zip(losses["take"], losses["auto"]):
        assert abs(a - b) < 5e-3 * max(abs(a), 1.0), (losses["take"],
                                                      losses["auto"])
