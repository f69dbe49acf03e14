"""TLSAN model-level tests: shapes, masking semantics, loss/grad sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models.tlsan import TLSAN


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        model="tlsan", user_count=50, item_count=40, cate_count=7,
        Ls=10, Ts=8, num_heads=8, hidden_units=64)
    params = TLSAN.init_params(jax.random.PRNGKey(0), cfg)
    cate_list = jnp.asarray(np.random.default_rng(0).integers(0, 7, size=40),
                            dtype=jnp.int32)
    rng = np.random.default_rng(1)
    B = 6
    batch = {
        "u": jnp.asarray(rng.integers(0, 50, B), jnp.int32),
        "c": jnp.asarray(rng.integers(0, 7, B), jnp.int32),
        "i": jnp.asarray(rng.integers(0, 40, B), jnp.int32),
        "j": jnp.asarray(rng.integers(0, 40, B), jnp.int32),
        "y": jnp.asarray(rng.integers(0, 2, B), jnp.float32),
        "hist_i": jnp.asarray(rng.integers(0, 40, (B, 10)), jnp.int32),
        "hist_t": jnp.asarray(rng.uniform(0.1, 1.0, (B, 10)), jnp.float32),
        "hist_i_new": jnp.asarray(rng.integers(0, 40, (B, 8)), jnp.int32),
        "sl": jnp.asarray(rng.integers(1, 11, B), jnp.int32),
        "sl_new": jnp.asarray(rng.integers(1, 9, B), jnp.int32),
    }
    return cfg, params, cate_list, batch


def test_shapes(setup):
    cfg, params, cate_list, batch = setup
    u_t = TLSAN.user_repr(params, batch, cate_list, cfg, use_pallas=False)
    assert u_t.shape == (6, 64)
    logits = TLSAN.eval_logits(params, batch, cate_list, cfg, use_pallas=False)
    assert logits.shape == (6, 40)


def test_gamma_scales_long_term(setup):
    """gamma multiplies the positional matrix (TLSAN/model.py:105-109):
    setting gamma=0 zeroes the long-term history input entirely."""
    cfg, params, cate_list, batch = setup
    p0 = dict(params, gamma=jnp.asarray(0.0))
    u0 = TLSAN.user_repr(p0, batch, cate_list, cfg, use_pallas=False)
    # with gamma=0 the long tower sees zeros; output must be independent of hist_i
    b2 = dict(batch, hist_i=jnp.zeros_like(batch["hist_i"]))
    u1 = TLSAN.user_repr(p0, b2, cate_list, cfg, use_pallas=False)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), rtol=1e-5, atol=1e-6)


def test_padding_invariance_short_term(setup):
    """Short-session positions beyond sl_new are masked out
    (TLSAN/model.py:351-357 via sequence_mask(sl_new+1))."""
    cfg, params, cate_list, batch = setup
    sl_new = jnp.asarray([2] * 6, jnp.int32)
    b1 = dict(batch, sl_new=sl_new)
    hist2 = np.asarray(batch["hist_i_new"]).copy()
    hist2[:, 2:] = 39  # rewrite padded region
    b2 = dict(b1, hist_i_new=jnp.asarray(hist2))
    u1 = TLSAN.user_repr(params, b1, cate_list, cfg, use_pallas=False)
    u2 = TLSAN.user_repr(params, b2, cate_list, cfg, use_pallas=False)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-5, atol=1e-6)


def test_loss_and_grads(setup):
    cfg, params, cate_list, batch = setup
    loss, grads = jax.value_and_grad(TLSAN.loss)(
        params, batch, cate_list, cfg, use_pallas=False)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # tables receive dense L2 gradient (reference regularizes full tables,
    # TLSAN/model.py:164-172), so every table grad is nonzero
    for name in ("user_emb", "item_emb", "cate_emb", "usert_emb"):
        assert np.abs(np.asarray(grads[name])).sum() > 0


def test_pair_logits_consistency(setup):
    """AUC pair logits must equal pointwise logits computed separately."""
    cfg, params, cate_list, batch = setup
    pos, neg = TLSAN.pair_logits(params, batch, cate_list, cfg, use_pallas=False)
    full = TLSAN.eval_logits(params, batch, cate_list, cfg, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(pos), np.asarray(full)[np.arange(6), np.asarray(batch["i"])],
        rtol=1e-4, atol=1e-4)


def test_attention_maps_shapes_and_softmax():
    """att0/att1 parity surface (reference fetches TLSAN/model.py:122,366):
    softmax over the time axis per feature, masked beyond sl."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tlsan_tpu.core.config import ModelConfig
    from tlsan_tpu.models.tlsan import TLSAN

    cfg = ModelConfig(model="tlsan", user_count=16, item_count=32,
                      cate_count=4, Ls=10, Ts=8)
    params = TLSAN.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "u": jnp.asarray(rng.integers(0, 16, B), jnp.int32),
        "c": jnp.asarray(rng.integers(0, 4, B), jnp.int32),
        "hist_i": jnp.asarray(rng.integers(0, 32, (B, 10)), jnp.int32),
        "hist_t": jnp.asarray(rng.uniform(0.1, 1, (B, 10)), jnp.float32),
        "hist_i_new": jnp.asarray(rng.integers(0, 32, (B, 8)), jnp.int32),
        "sl": jnp.asarray([3, 10, 1, 7], jnp.int32),
        "sl_new": jnp.asarray([2, 8, 1, 4], jnp.int32),
    }
    cate_list = jnp.asarray(rng.integers(0, 4, 32), jnp.int32)
    att0, att1 = TLSAN.attention_maps(params, batch, cate_list, cfg)
    H, dh = cfg.num_heads, 64 // cfg.num_heads
    assert att0.shape == (B, 10, H, dh)
    assert att1.shape == (B, 8 + 1, H, dh)
    # softmax over time: columns sum to 1
    np.testing.assert_allclose(np.asarray(att0.sum(axis=1)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(att1.sum(axis=1)), 1.0, rtol=1e-5)
    # masked long-window rows beyond sl get (near-)zero weight
    assert float(att0[0, 3:, :, :].max()) < 1e-6
