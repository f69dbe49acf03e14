"""Cross-model contract tests: every family initializes, runs the forward
pass, produces finite loss and gradients, and scores the full catalog."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import get_model

USERS, ITEMS, CATES, B = 20, 30, 5, 4


def make_batch(model_name, rng):
    batch = {
        "u": jnp.asarray(rng.integers(0, USERS, B), jnp.int32),
        "i": jnp.asarray(rng.integers(0, ITEMS, B), jnp.int32),
        "j": jnp.asarray(rng.integers(0, ITEMS, B), jnp.int32),
        "y": jnp.asarray(rng.integers(0, 2, B), jnp.float32),
    }
    if model_name == "tlsan":
        batch.update(
            c=jnp.asarray(rng.integers(0, CATES, B), jnp.int32),
            hist_i=jnp.asarray(rng.integers(0, ITEMS, (B, 10)), jnp.int32),
            hist_t=jnp.asarray(rng.uniform(0.1, 1, (B, 10)), jnp.float32),
            hist_i_new=jnp.asarray(rng.integers(0, ITEMS, (B, 8)), jnp.int32),
            sl=jnp.asarray(rng.integers(1, 11, B), jnp.int32),
            sl_new=jnp.asarray(rng.integers(1, 9, B), jnp.int32))
    elif model_name == "shan":
        batch.update(
            hist_i=jnp.asarray(rng.integers(0, ITEMS, (B, 12)), jnp.int32),
            hist_i_new=jnp.asarray(rng.integers(0, ITEMS, (B, 8)), jnp.int32),
            sl=jnp.asarray(rng.integers(1, 13, B), jnp.int32),
            sl_new=jnp.asarray(rng.integers(1, 9, B), jnp.int32))
    elif model_name in ("paca", "bilstm"):
        batch.update(
            hist_i=jnp.asarray(rng.integers(0, ITEMS, (B, 12)), jnp.int32),
            sl=jnp.asarray(rng.integers(1, 13, B), jnp.int32))
    elif model_name in ("atrank", "cnn"):
        batch.update(
            hist_i=jnp.asarray(rng.integers(0, ITEMS, (B, 12)), jnp.int32),
            hist_t=jnp.asarray(rng.integers(0, 13, (B, 12)), jnp.int32),
            sl=jnp.asarray(rng.integers(1, 13, B), jnp.int32))
    elif model_name == "csan":
        batch.update(
            hist_i=jnp.asarray(rng.integers(0, ITEMS, (B, 12)), jnp.int32),
            hist_t=jnp.asarray(rng.uniform(1, 100, (B, 12)), jnp.float32),
            sl=jnp.asarray(rng.integers(1, 13, B), jnp.int32))
    elif model_name == "lspm":
        batch.update(
            hist_i=jnp.asarray(rng.integers(0, ITEMS, (B, 5)), jnp.int32),
            sl=jnp.asarray(rng.integers(1, 6, B), jnp.int32))
    return batch


ALL_MODELS = ["tlsan", "shan", "atrank", "bpr", "lspm", "paca",
              "cnn", "bilstm", "csan"]


@pytest.mark.parametrize("name", ALL_MODELS)
def test_model_contract(name):
    cfg = ModelConfig(model=name, user_count=USERS, item_count=ITEMS,
                      cate_count=CATES, Ls=10, Ts=8, max_length=12,
                      cnn_pad_length=20, paca_max_len=12,
                      hidden_units=32 if name == "csan" else 64)
    model = get_model(name)
    rng = np.random.default_rng(0)
    params = model.init_params(jax.random.PRNGKey(0), cfg)
    cate_list = jnp.asarray(rng.integers(0, CATES, ITEMS), jnp.int32)
    batch = make_batch(name, rng)

    loss, grads = jax.value_and_grad(model.loss)(
        params, batch, cate_list, cfg, False)
    assert np.isfinite(float(loss)), name
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all(), name

    pos, neg = model.pair_logits(params, batch, cate_list, cfg, False)
    assert pos.shape == (B,) and neg.shape == (B,)

    full = model.eval_logits(params, batch, cate_list, cfg, False)
    assert full.shape == (B, ITEMS)

    # pointwise logits consistent with the catalog row of the same item
    # (models whose user tower is target-conditioned share the i-query)
    np.testing.assert_allclose(
        np.asarray(pos),
        np.asarray(full)[np.arange(B), np.asarray(batch["i"])],
        rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_model_determinism(name):
    cfg = ModelConfig(model=name, user_count=USERS, item_count=ITEMS,
                      cate_count=CATES, Ls=10, Ts=8, max_length=12,
                      cnn_pad_length=20, paca_max_len=12)
    model = get_model(name)
    p1 = model.init_params(jax.random.PRNGKey(7), cfg)
    p2 = model.init_params(jax.random.PRNGKey(7), cfg)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cnn_short_window():
    """The shortened conv window (pad to T + max_fs instead of the
    reference's fixed 500) is EXACTLY the reference computation: every
    conv window fully inside the zero pad evaluates to relu(b), and the
    shortened form keeps >=1 such window per tower, so the time max-pool
    is unchanged (CNN/model.py:299-324)."""
    cfg = ModelConfig(model="cnn", user_count=USERS, item_count=ITEMS,
                      cate_count=CATES, max_length=12, cnn_pad_length=500)
    model = get_model("cnn")
    rng = np.random.default_rng(3)
    params = model.init_params(jax.random.PRNGKey(1), cfg)
    cate_list = jnp.asarray(rng.integers(0, CATES, ITEMS), jnp.int32)
    batch = make_batch("cnn", rng)

    fast = model.user_repr(params, batch, cate_list, cfg, False)

    # literal reference form: pad the masked sequence to the full 500 and
    # run the VALID conv towers + time max-pool over the whole length
    from tlsan_tpu.nn.layers import dense
    from tlsan_tpu.nn.masks import sequence_mask
    from tlsan_tpu.nn.embedding import item_cate_lookup
    h = item_cate_lookup(params["item_emb"], params["cate_emb"],
                         batch["hist_i"], cate_list)
    t_onehot = jax.nn.one_hot(batch["hist_t"], 12, dtype=h.dtype)
    h = dense(jnp.concatenate([h, t_onehot], axis=-1),
              params["time_w"], params["time_b"])
    T = h.shape[1]
    h = h * sequence_mask(batch["sl"], T).astype(h.dtype)[:, :, None]
    h = jnp.pad(h, ((0, 0), (0, cfg.cnn_pad_length - T), (0, 0)))
    lhs = h[:, :, :, None]
    pooled = []
    for tw in params["towers"]:
        conv = jax.lax.conv_general_dilated(
            lhs, tw["w"], window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        act = jax.nn.relu(conv + tw["b"])
        pooled.append(jnp.max(act, axis=1)[:, 0, :])
    flat = jnp.concatenate(pooled, axis=-1)
    ref = dense(flat, params["out_w"], params["out_b"])

    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


# families whose reference model applies the --dropout flag at train time
# (TLSAN/train.py:30, ATRank/model.py attention dropout, CNN/model.py,
# CSAN/model.py:273-297,385 — SHAN's flag is a dead variable, Bi-LSTM/LSPM/
# PACA/BPR have none)
DROPOUT_MODELS = ["tlsan", "atrank", "cnn", "csan"]


@pytest.mark.parametrize("name", DROPOUT_MODELS)
def test_dropout_engages_and_is_eval_neutral(name):
    """Regression for the round-5 CSAN finding: a model silently ignoring
    cfg.dropout makes dropout-axis studies no-ops.  For every family whose
    reference applies dropout: (a) train-time loss must depend on the
    dropout_rng when dropout > 0, (b) dropout=0 with an rng must be
    bit-identical to the no-rng eval path."""
    rng = np.random.default_rng(3)
    cfg = ModelConfig(model=name, user_count=USERS, item_count=ITEMS,
                      cate_count=CATES, Ls=10, Ts=8, max_length=12,
                      cnn_pad_length=20, paca_max_len=12,
                      hidden_units=32 if name == "csan" else 64,
                      dropout=0.3)
    model = get_model(name)
    params = model.init_params(jax.random.PRNGKey(0), cfg)
    cate_list = jnp.asarray(rng.integers(0, CATES, ITEMS), jnp.int32)
    batch = make_batch(name, rng)

    base_loss = float(model.loss(params, batch, cate_list, cfg,
                                 use_pallas=False))
    l1 = float(model.loss(params, dict(batch, dropout_rng=jax.random.PRNGKey(1)),
                          cate_list, cfg, use_pallas=False))
    l2 = float(model.loss(params, dict(batch, dropout_rng=jax.random.PRNGKey(2)),
                          cate_list, cfg, use_pallas=False))
    assert l1 != l2 or l1 != base_loss, \
        f"{name}: dropout_rng has no effect at dropout=0.3"

    cfg0 = ModelConfig(model=name, user_count=USERS, item_count=ITEMS,
                       cate_count=CATES, Ls=10, Ts=8, max_length=12,
                       cnn_pad_length=20, paca_max_len=12,
                       hidden_units=32 if name == "csan" else 64,
                       dropout=0.0)
    params0 = model.init_params(jax.random.PRNGKey(0), cfg0)
    e0 = float(model.loss(params0, batch, cate_list, cfg0, use_pallas=False))
    e1 = float(model.loss(params0, dict(batch, dropout_rng=jax.random.PRNGKey(1)),
                          cate_list, cfg0, use_pallas=False))
    assert e0 == e1, f"{name}: dropout=0 train path diverges from eval path"
